"""Stage attribution for the 128^3 warm device setup (VERDICT r4 item 7).

The one-jit chain (`structured_mg._setup_chain_dev`) runs ~3 s of DEVICE
time at 128^3 (r4 working notes) with no visibility inside the
executable. This times each chain stage as its OWN jit at the same
shapes — interpolation, RAP, level stats, lambda power iteration, DIA
packing, DIA transfers, dense coarse inverse — so the 3 s can be
attributed and the right stage attacked (Pallas RAP, fewer passes, ...).

Per-stage dispatch is timed warm (min of 3) with a scalar fetch sync.
The sum of stages over- counts the chain slightly (dispatch overhead per
stage, no inter-stage fusion) — it bounds the chain from above and the
RATIO between stages is the signal.

Usage: python bench/setup_profile_tpu.py [n]     (default 128)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.amg.boxmg import csr_to_stencil
from amg_ann_tpu.amg.structured_mg import setup_structured
from amg_ann_tpu.fem import poisson_7pt


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("device", jax.devices()[0].device_kind, file=sys.stderr)

    from amg_ann_tpu.amg.boxmg_device import (
        axis_couplings_dev, interp_weights_boxmg_dev, lam_power_dev,
        level_stats_dev, nnz_count_dev, rap_stencil_dev,
        stencil_to_dia_dev)
    from amg_ann_tpu.amg.transfer import transfer_dia

    a = poisson_7pt(n)
    params = AMGParams(strong_threshold=0.25, smoother="chebyshev",
                       dtype=np.float32, max_coarse_size=2048)
    s0 = csr_to_stencil(a, (n, n, n)).astype(np.float32)
    slots = tuple(k for k in range(27) if s0[k].any())
    s_dev = jax.block_until_ready(jnp.asarray(s0))

    # reference point: the full chain, warm
    t0 = time.perf_counter()
    h = setup_structured(a, (n, n, n), params, stencil=s_dev,
                         a_slots=slots)
    t_chain = time.perf_counter() - t0
    shapes = [(n, n, n)]
    strides = h.strides if hasattr(h, "strides") else None
    report = {"n": n, "t_chain_warm_s": round(t_chain, 3),
              "stages": []}

    theta = jnp.asarray(0.25, dtype=jnp.float32)
    s_l, slots_l = s_dev, slots
    sh = (n, n, n)
    lvl = 0
    while int(np.prod(sh)) > params.max_coarse_size and lvl < 12:
        st = (2, 2, 2)
        row = {"level": lvl, "shape": list(sh)}
        t, coup = timeit(axis_couplings_dev, s_l)
        row["couplings_s"] = round(t, 4)
        t, w = timeit(lambda: interp_weights_boxmg_dev(
            s_l, theta, strides=st, mrs=0.9))
        row["interp_s"] = round(t, 4)
        t, s_c = timeit(lambda: rap_stencil_dev(s_l, w, strides=st,
                                                a_slots=slots_l))
        row["rap_s"] = round(t, 4)
        t, stats = timeit(level_stats_dev, s_l)
        row["level_stats_s"] = round(t, 4)
        inv_diag = stats[0]
        if int(np.prod(sh)) <= 100000:
            t, _ = timeit(lambda: lam_power_dev(s_l, inv_diag))
            row["lam_power_s"] = round(t, 4)
        t, _ = timeit(lambda: stencil_to_dia_dev(s_l, sh, slots=slots_l))
        row["dia_pack_s"] = round(t, 4)
        t, _ = timeit(lambda: transfer_dia(w, sh, st))
        row["transfer_dia_s"] = round(t, 4)
        t, _ = timeit(nnz_count_dev, s_l)
        row["nnz_count_s"] = round(t, 4)
        report["stages"].append(row)
        s_l = s_c
        slots_l = tuple(range(27))
        sh = tuple(d // 2 for d in sh)
        lvl += 1
    report["t_stage_sum_s"] = round(sum(
        sum(v for k, v in r.items() if k.endswith("_s"))
        for r in report["stages"]), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
