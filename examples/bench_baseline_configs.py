"""BASELINE.json configs 2–4 measurements (config 1 is bench.py).

  2. 128³ jumping-coefficient diffusion, ANN-PREDICTED θ (needs a trained
     model, e.g. data/models/tc2-ref) vs default θ=0.5 — the deployment
     loop of SURVEY §7.6 on the structured TPU fast path.
  3. unstructured P1 tet elliptic matrix, distributed rows (classical
     GSPMD path over the available mesh).
  4. anisotropic diffusion, Chebyshev vs ℓ1-Jacobi smoothing through the
     banded structured path (θ-driven semicoarsening active).

Each run prints one JSON line; pass --out to append them to a file.
Config 5 (256³ multi-host) needs a pod slice; dist/structured.py +
dist/multihost.scaling_report are the entry points there.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _emit(out, rec):
    line = json.dumps(rec)
    print(line, flush=True)
    if out:
        with open(out, "a") as f:
            f.write(line + "\n")


def config2_ann_theta(out, models_path, n=128, pattern=8, mode=2,
                      seed=101):
    """128³ jumping-coefficient diffusion, ANN-predicted θ vs θ=0.5.

    Measured with the TRAINING contract (BASELINE.md methodology, the
    reference's t = t_solve + t_amg_setup): the fine stencil is uploaded
    once, every θ re-runs the same compiled device setup + solve
    executables (the marginal cost a production sweep pays), warm-started
    and min-of-N. The full θ grid is measured too, so P = 1 − t(θ*)/t(0.5)
    is reported alongside P_MAX = 1 − t_min/t(0.5)."""
    import jax
    import jax.numpy as jnp

    from amg_ann_tpu.amg import AMGParams
    from amg_ann_tpu.amg.boxmg import csr_to_stencil
    from amg_ann_tpu.amg.structured_mg import setup_structured
    from amg_ann_tpu.ann.checkpoint import load_model
    from amg_ann_tpu.fem.structured import StructuredDiffusion
    from amg_ann_tpu.solvers.amg_solver import amg_solve
    from amg_ann_tpu.solvers.ann_solver import predict_theta_for_matrix

    # newest model dir with a checkpoint
    cands = [d for d in os.listdir(models_path)
             if os.path.isdir(os.path.join(models_path, d))
             and d.startswith("model")]
    assert cands, f"no trained model under {models_path}"
    model_id = sorted(cands)[-1]
    model, params_nn, spec = load_model(os.path.join(models_path, model_id))

    rng = np.random.default_rng(seed)   # held out of the training seeds
    refinements = int(np.log2((n + 1) // pattern))
    p = StructuredDiffusion(pattern_size=pattern, refinements=refinements,
                            degree=1, mode=mode,
                            epsv=rng.uniform(0, 6.0, pattern ** mode))
    a, b, x0 = p.build()
    gs = (p.n_nodes_1d,) * 3

    s0 = csr_to_stencil(a, gs).astype(np.float32)
    a_slots = tuple(k for k in range(27) if np.any(s0[k]))
    stencil = jnp.asarray(s0)

    # deployment fast path: device view from the resident stencil +
    # cached-jit inference; cold includes the compiles, warm is the
    # marginal per-problem cost a production deployment pays
    scal = {"log2ndof": float(np.log2(a.nrows)), "theta": 0.5,
            "degree": 1.0}
    t0 = time.perf_counter()
    theta_star, _, sigma = predict_theta_for_matrix(
        None, model, params_nn, view_size=spec["view_size"],
        scalar_inputs=scal, stencil=stencil, grid_shape=gs)
    t_predict_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    theta_star, _, sigma = predict_theta_for_matrix(
        None, model, params_nn, view_size=spec["view_size"],
        scalar_inputs=scal, stencil=stencil, grid_shape=gs)
    t_predict = time.perf_counter() - t0
    theta_star = float(np.clip(theta_star, 0.05, 0.95))

    def t_of(theta: float, reps: int = 3) -> tuple:
        """(t_us, niters, converged) — SCALARS only: keeping hierarchies
        for 19 θ at 129³ exhausts HBM (~0.5 GB of device arrays each)."""
        params = AMGParams(strong_threshold=float(theta),
                           smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=2048)
        setup_structured(a, gs, params, stencil=stencil,
                         a_slots=a_slots)          # warm (compiles)
        h = setup_structured(a, gs, params, stencil=stencil,
                             a_slots=a_slots)
        best = None
        for _ in range(reps):
            r = amg_solve(a, b, params, x0=x0, hierarchy=h, rtol=1e-6,
                          tol=0.0)
            t = h.stats.t_setup * 1e6 + r.t_solve   # µs, reference metric
            if best is None or t < best[0]:
                best = (t, r.niters, bool(r.converged))
        return best

    grid = np.round(np.arange(0.05, 0.951, 0.05), 2)
    curve = {}
    for th in grid:
        curve[float(th)] = t_of(th)
    t_default = curve[0.5][0]
    t_star, niters_star, conv_star = (
        curve[round(theta_star, 2)]
        if round(theta_star, 2) in curve else t_of(theta_star))
    t_min = min(v[0] for v in curve.values())
    th_min = min(curve, key=lambda k: curve[k][0])
    perf = 1.0 - t_star / t_default
    perf_max = 1.0 - t_min / t_default
    _emit(out, {"config": "128cube_ann_theta", "ndof": a.nrows,
                "mode": mode, "theta_star": theta_star,
                "sigma_hat": float(sigma), "t_predict_s": t_predict,
                "t_predict_cold_s": t_predict_cold,
                "t_default_s": t_default / 1e6, "t_ann_s": t_star / 1e6,
                "t_min_s": t_min / 1e6, "theta_min": th_min,
                "P": round(perf, 4), "P_MAX": round(perf_max, 4),
                "niters_ann": niters_star, "converged": conv_star,
                "t_curve_s": {f"{k:.2f}": round(v[0] / 1e6, 4)
                              for k, v in curve.items()},
                "model": model_id})


def config3_unstructured_dist(out):
    import jax

    from amg_ann_tpu.amg import AMGParams, setup
    from amg_ann_tpu.dist import make_mesh, shard_solve
    from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion

    from amg_ann_tpu.solvers.amg_solver import amg_solve

    p = UnstructuredDiffusion(mesh="Cube", refinements=3, seed=0,
                              max_diffusion=2.0)
    a, b, x0 = p.build()

    # single-chip WELL path (round 4): the gather-free windowed-ELL
    # Pallas kernel + RCM/induced orderings (sparse/well.py)
    hw = setup(a, AMGParams(dtype=np.float32, smoother="chebyshev",
                            device_format="well"))
    r = amg_solve(a, b, hw.params, hierarchy=hw, rtol=1e-6, tol=0.0)
    best = r
    for _ in range(2):
        r = amg_solve(a, b, hw.params, hierarchy=hw, rtol=1e-6, tol=0.0)
        if r.t_solve < best.t_solve:
            best = r
    nnz_work = int(best.niters) * sum(hw.stats.nnz)
    _emit(out, {"config": "unstructured_p1_well_single_chip",
                "ndof": a.nrows, "niters": int(best.niters),
                "t_solve_s": best.t_solve / 1e6,
                "nnz_per_s": nnz_work / (best.t_solve / 1e6),
                "converged": bool(best.converged)})

    # GSPMD row-sharded path (ELL pinned — shard_hierarchy partitions
    # ELL row arrays; WELL shards by 1024-row blocks, not supported here)
    h = setup(a, AMGParams(dtype=np.float32, smoother="chebyshev",
                           device_format="ell"))
    mesh = make_mesh()
    r = shard_solve(h, b, mesh=mesh, rtol=1e-6, tol=0.0, maxiter=200)
    jax.block_until_ready(r.x)
    t0 = time.perf_counter()
    r = shard_solve(h, b, mesh=mesh, rtol=1e-6, tol=0.0, maxiter=200)
    jax.block_until_ready(r.x)
    t = time.perf_counter() - t0
    nnz_work = int(r.niters) * sum(h.stats.nnz)
    _emit(out, {"config": "unstructured_p1_distributed_rows",
                "ndof": a.nrows, "devices": len(mesh.devices.ravel()),
                "niters": int(r.niters), "t_solve_s": t,
                "nnz_per_s": nnz_work / t, "converged": bool(r.converged)})


def config4_smoother_battle(out, n=64):
    """Anisotropic diffusion, Chebyshev vs ℓ1-Jacobi smoothing — SOLVE
    time on a prebuilt hierarchy (the smoother choice doesn't change
    setup), warm, min-of-3, plus the θ-driven semicoarsening evidence."""
    from amg_ann_tpu.amg import AMGParams
    from amg_ann_tpu.fem import anisotropic_27pt
    from amg_ann_tpu.amg.structured_mg import setup_structured
    from amg_ann_tpu.solvers import ir_solve

    a = anisotropic_27pt(n)
    b = a.matvec(np.random.default_rng(0).random(n ** 3))
    rec = {"config": "anisotropic_cheb_vs_l1", "ndof": a.nrows}
    for sm in ("chebyshev", "l1jacobi"):
        params = AMGParams(strong_threshold=0.9, smoother=sm,
                           dtype=np.float32, max_coarse_size=2048)
        # first build pays compiles (whichever smoother runs first in
        # this loop eats the cold-cache cost — the r3 "Chebyshev setup
        # anomaly" was exactly this ordering artifact); the SECOND build
        # is the honest θ-marginal setup both smoothers should tie on
        h = setup_structured(a, (n, n, n), params)
        t_cold = h.stats.t_setup
        h = setup_structured(a, (n, n, n), params)
        best = None
        for rep in range(4):
            r = ir_solve(a, b, params, hierarchy=h, rtol=1e-8,
                         equilibrate=False)
            if rep and (best is None or r.t_solve < best.t_solve):
                best = r              # rep 0 = warm/compile
        rec[sm] = dict(t_solve_s=best.t_solve / 1e6,
                       t_setup_s=h.stats.t_setup,
                       t_setup_cold_s=t_cold,
                       inner_iters=best.inner_iters,
                       outer_iters=best.outer_iters,
                       converged=bool(best.converged),
                       levels=h.stats.n_levels,
                       strides_l0=list(h.device.levels[0].strides))
    _emit(out, rec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--models", default="data/models/tc2-ref")
    ap.add_argument("--configs", nargs="+", default=["2", "3", "4"])
    ap.add_argument("--n2", type=int, default=128)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # ir_solve's outer Richardson needs REAL f64 residuals (emulated on
    # TPU); without x64 the 1e-8 targets are unreachable on ill-
    # conditioned (jumping-coefficient) systems
    jax.config.update("jax_enable_x64", True)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if "2" in args.configs:
        config2_ann_theta(args.out, args.models, n=args.n2)
    if "3" in args.configs:
        config3_unstructured_dist(args.out)
    if "4" in args.configs:
        config4_smoother_battle(args.out)


if __name__ == "__main__":
    main()
