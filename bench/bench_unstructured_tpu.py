"""TPU benchmark: unstructured (tc1) path with the WELL kernel.

BASELINE.json config 3 ("unstructured_p1_distributed_rows"): the 36k-DoF
P1 tet diffusion matrix. Round-3 state: XLA-gather ELL at ~16 Mnnz/s,
0.54 s/solve. Measures (1) sustained fine-level SpMV throughput via a
fori_loop of SPMV_REPS inside one jit, (2) full ir_solve wall time.

Usage: python bench/bench_unstructured_tpu.py [refinements] [degree]
Env: BENCH_FMT=well|ell (default well)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion
from amg_ann_tpu.solvers import ir_solve
from amg_ann_tpu.sparse import well

REF = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 1
FMT = os.environ.get("BENCH_FMT", "well")
SPMV_REPS = int(os.environ.get("SPMV_REPS", "200"))


def main():
    print("device", jax.devices()[0].device_kind, file=sys.stderr)
    prob = UnstructuredDiffusion(mesh="Cube", refinements=REF, seed=3,
                                 max_diffusion=3.0, degree=DEG)
    t0 = time.perf_counter()
    a, b, _ = prob.build()
    t_build = time.perf_counter() - t0
    print(f"ndof {a.nrows} nnz {a.nnz} built {t_build:.1f}s",
          file=sys.stderr)

    # BENCH_DENSE_THRESH: coarse levels with <= this many rows run as
    # padded dense operators on the MXU (default 2048; 8192 converts the
    # ~6k level-1 of the 36k problem to one matmul per op — the solve is
    # op-LAUNCH bound, not bandwidth bound, so fewer/denser ops win)
    dct = int(os.environ.get("BENCH_DENSE_THRESH", "2048"))
    params = AMGParams(strong_threshold=0.25, dtype=np.float32,
                       device_format=FMT, dense_coarse_threshold=dct)

    # --- sustained fine-level SpMV ---------------------------------
    if FMT == "well":
        perm = well.best_perm(a)
        ap = well.permute_sym(a, perm) if perm is not None else a
        w = well.from_csr(ap, dtype=np.float32)
        print(f"WELL nblk {w.nblk} k {w.k} s_max {w.s_max} "
              f"mean_snum {float(np.mean(np.asarray(w.snum))):.1f}",
              file=sys.stderr)
        op = w
        from amg_ann_tpu.sparse.well import spmv as op_spmv
        nd = w.padded_rows
    else:
        from amg_ann_tpu.sparse import ell as ell_mod
        op = ell_mod.from_csr(a, dtype=np.float32)
        op_spmv = ell_mod.spmv
        nd = op.data.shape[0]

    x0 = jnp.asarray(np.random.default_rng(0).random(nd), dtype=jnp.float32)

    @jax.jit
    def sustained(x):
        def body(i, x):
            y = op_spmv(op, x)
            return y / (jnp.linalg.norm(y) + 1.0)
        return jax.lax.fori_loop(0, SPMV_REPS, body, x)

    t0 = time.perf_counter()
    r = sustained(x0)
    s = float(jnp.sum(r))            # hard sync
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(jnp.sum(sustained(x0)))
    t_warm = time.perf_counter() - t0
    spmv_s = t_warm / SPMV_REPS
    gnnz = a.nnz / spmv_s / 1e9
    print(f"SpMV cold {t_cold:.1f}s warm {t_warm*1e3:.1f}ms "
          f"-> {spmv_s*1e6:.0f} us/SpMV = {gnnz:.2f} Gnnz/s",
          file=sys.stderr)

    # --- full solve --------------------------------------------------
    # ir_solve equilibrates internally, so a prebuilt hierarchy matches
    # the SCALED operator — time fresh calls (jit cache reused the 2nd
    # time) and report the device-side res.t_solve
    t0 = time.perf_counter()
    res = ir_solve(a, b, params, rtol=1e-8)
    t_solve_cold = time.perf_counter() - t0
    res = ir_solve(a, b, params, rtol=1e-8)
    t_solve_warm = res.t_solve / 1e6
    out = {
        "config": "unstructured_p1",
        "fmt": FMT, "ndof": a.nrows, "nnz": a.nnz,
        "spmv_gnnz_s": round(gnnz, 3),
        "spmv_us": round(spmv_s * 1e6, 1),
        "t_solve_warm_s": round(t_solve_warm, 3),
        "t_solve_cold_s": round(t_solve_cold, 2),
        "outer_iters": res.outer_iters, "inner_iters": res.inner_iters,
        "true_rel_res": float(res.true_res),
        "converged": bool(res.converged),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
