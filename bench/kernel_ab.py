"""Raw DIA-SpMV kernel A/B: throughput vs block_rows × pipelining.

Measures dia_spmv_pallas_nopad (the V-cycle's dominant traffic pattern)
on a 27-offset structured operator, amortized inside one jit (200-matvec
lax.fori_loop, single scalar fetch — the axon tunnel costs ~50 ms per
host sync). Prints one JSON line per configuration.

Usage: BENCH_N=128 python bench/kernel_ab.py [--blocks 128 256 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[64, 128, 256, 512])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--db", type=int, nargs="+", default=[0, 1])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from amg_ann_tpu.fem import poisson_7pt
    from amg_ann_tpu.amg.boxmg import csr_to_stencil, rap_stencil
    from amg_ann_tpu.amg.boxmg import interp_weights_boxmg
    from amg_ann_tpu.amg.boxmg import stencil_to_dia
    from amg_ann_tpu.sparse import pallas_spmv as ps
    from amg_ann_tpu.sparse.pallas_spmv import dia_spmv_pallas_nopad

    n = int(os.environ.get("BENCH_N", "128"))
    a = poisson_7pt(n, dtype=np.float32)
    s = csr_to_stencil(a, (n, n, n))
    # one Galerkin RAP -> a TRUE 27-point operator (the 7-point fine
    # stencil has only ~7 active bands; level-1 is the common case)
    w = interp_weights_boxmg(s, 0.25)
    s1 = rap_stencil(s, w)
    for name, st in (("fine7pt", s), ("galerkin27", s1)):
        d = stencil_to_dia(st.astype(np.float32), dtype=np.float32,
                           keep_all_slots=True)
        k, r, _ = d.data.shape
        x = jnp.asarray(np.random.default_rng(0)
                        .random((r, 128)).astype(np.float32))

        for db in args.db:
            for b in args.blocks:
                if r % b or b + 2 * ps.halo_rows(d.offsets) > r:
                    continue

                def run(x0, data=d.data, offs=d.offsets, b=b, db=db):
                    def body(_, v):
                        y = dia_spmv_pallas_nopad(data, v, offs,
                                                  block_rows=b,
                                                  db=bool(db))
                        return y * (1.0 / 6.0)
                    return jax.lax.fori_loop(0, args.iters, body, x0)

                f = jax.jit(run)
                try:
                    out = f(x)
                    float(out[0, 0])        # hard sync
                    t0 = time.perf_counter()
                    out = f(x)
                    float(out[0, 0])
                    dt = (time.perf_counter() - t0) / args.iters
                except Exception as e:
                    print(json.dumps({"op": name, "block_rows": b,
                                      "db": db,
                                      "error": f"{type(e).__name__}"}),
                          flush=True)
                    continue
                nnz = k * r * 128
                gb = nnz * 4 * 1.2e-9      # A + ~20% x/y traffic
                print(json.dumps({
                    "op": name, "n": n, "k": k, "rows": r,
                    "block_rows": b, "db": db,
                    "t_matvec_us": round(dt * 1e6, 2),
                    "gnnz_s": round(nnz / dt / 1e9, 2),
                    "gb_s": round(gb / dt, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
