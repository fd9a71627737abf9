"""θ-marginal device-setup timing on TPU — the round-4 one-jit chain.

Measures the warm (jit-cached) structured setup cost the sweep harness
pays per θ, for the scalar path (64³/128³ Poisson) and the tc3 block
path (33³ elasticity nodes, nb=3), plus a solve sanity check. Round-3
baselines: 0.345 s warm at 64³, ~3 s at 128³, ~10 s block (the
many-dispatch eager chain through the axon tunnel).

Usage: python bench/setup_marginal_tpu.py [n ...]   (default 64 128)
Env: BENCH_BLOCK=0 to skip the tc3 block measurement.
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
from amg_ann_tpu.amg.boxmg import csr_to_stencil
from amg_ann_tpu.amg.structured_mg import setup_structured
from amg_ann_tpu.fem import poisson_7pt
from amg_ann_tpu.solvers import ir_solve


def scalar_case(n):
    a = poisson_7pt(n)
    b = a.matvec(np.random.default_rng(0).random(n ** 3))
    params = AMGParams(strong_threshold=0.25, smoother="chebyshev",
                       dtype=np.float32, max_coarse_size=2048)
    s0 = csr_to_stencil(a, (n, n, n)).astype(np.float32)
    slots = tuple(k for k in range(27) if s0[k].any())
    s_dev = jax.block_until_ready(jnp.asarray(s0))
    t0 = time.perf_counter()
    h = setup_structured(a, (n, n, n), params, stencil=s_dev, a_slots=slots)
    t_cold = time.perf_counter() - t0
    ts = []
    thetas = (0.25, 0.3, 0.35)          # distinct θ: the sweep pattern
    for th in thetas:
        p = AMGParams(strong_threshold=th, smoother="chebyshev",
                      dtype=np.float32, max_coarse_size=2048)
        t0 = time.perf_counter()
        h = setup_structured(a, (n, n, n), p, stencil=s_dev, a_slots=slots)
        ts.append(time.perf_counter() - t0)
    res = ir_solve(a, b, AMGParams(strong_threshold=0.35,
                                   smoother="chebyshev", dtype=np.float32,
                                   max_coarse_size=2048),
                   hierarchy=h, rtol=1e-8, equilibrate=False)
    return {"case": f"scalar_{n}", "t_setup_cold_s": round(t_cold, 2),
            "t_setup_warm_s": [round(t, 3) for t in ts],
            "inner_iters": res.inner_iters,
            "converged": bool(res.converged)}


def block_case(ref=4, smoother="chebyshev",
               thetas=(0.15, 0.2, 0.5, 0.85, 0.91)):
    from amg_ann_tpu.amg.boxmg_block import (csr_to_block_stencil,
                                             setup_structured_block)
    from amg_ann_tpu.fem.elasticity import LinearElasticity
    from amg_ann_tpu.solvers import amg_solve

    p = LinearElasticity(pattern_size=2, refinements=ref, degree=1,
                         mode=1, seed=0, max_young=2.0)
    a, b, x0 = p.build()
    gs = (p.n_nodes_1d,) * 3
    nb = 3
    sb = csr_to_block_stencil(a, gs, nb).astype(np.float32)
    stencil = jnp.asarray(sb)
    a_slots = tuple((k, ci, cj) for k in range(27)
                    for ci in range(nb) for cj in range(nb)
                    if np.any(sb[k, ci, cj]))
    params = AMGParams(strong_threshold=0.5, smoother=smoother,
                       aggressive_coarsening_num_levels=2,
                       dtype=np.float32)
    t0 = time.perf_counter()
    h = setup_structured_block(a, gs, params, np.float32, nb=nb,
                               stencil=stencil, slots=a_slots,
                               device_setup=True)
    t_cold = time.perf_counter() - t0
    ts, tsolves, niters = [], [], []
    for th in thetas:
        pp = AMGParams(strong_threshold=th, smoother=smoother,
                       aggressive_coarsening_num_levels=2,
                       dtype=np.float32)
        # the datagen pattern: warm + 2 timed setups, then 3 solves
        h = setup_structured_block(a, gs, pp, np.float32, nb=nb,
                                   stencil=stencil, slots=a_slots,
                                   device_setup=True)
        t0 = time.perf_counter()
        h = setup_structured_block(a, gs, pp, np.float32, nb=nb,
                                   stencil=stencil, slots=a_slots,
                                   device_setup=True)
        ts.append(time.perf_counter() - t0)
        r = amg_solve(a, b, pp, x0=x0, hierarchy=h, rtol=1e-6, tol=0.0)
        t0 = time.perf_counter()
        r = amg_solve(a, b, pp, x0=x0, hierarchy=h, rtol=1e-6, tol=0.0)
        tsolves.append(time.perf_counter() - t0)
        niters.append(r.niters)
    return {"case": f"block_r{ref}_{smoother}", "ndof": a.nrows,
            "t_setup_cold_s": round(t_cold, 2),
            "thetas": list(thetas),
            "t_setup_warm_s": [round(t, 3) for t in ts],
            "t_solve_warm_s": [round(t, 3) for t in tsolves],
            "niters": niters, "converged": bool(r.converged)}


def main():
    print("device", jax.devices()[0].device_kind, file=sys.stderr)
    ns = [int(x) for x in sys.argv[1:]]
    if not ns and os.environ.get("BENCH_SCALAR", "1") != "0":
        ns = [64, 128]
    out = []
    for n in ns:
        out.append(scalar_case(n))
        print(json.dumps(out[-1]), flush=True)
    if os.environ.get("BENCH_BLOCK", "1") != "0":
        ref = int(os.environ.get("BENCH_BLOCK_REF", "4"))
        for smoother in os.environ.get("BENCH_SMOOTHERS",
                                       "chebyshev").split(","):
            out.append(block_case(ref=ref, smoother=smoother))
            print(json.dumps(out[-1]), flush=True)


if __name__ == "__main__":
    main()
