"""Deployment demo: ANN-in-the-loop solve on an UNSEEN unstructured
problem with the shipped tc1 model.

The reference only simulates deployment offline (model_evaluation's
pred_theta over recorded sweeps); `ann_amg_solve` runs the predictor
inside the setup path. This script builds a problem whose seed appears in
no dataset, lets the model pick θ*, solves, then measures the TRUE t(θ)
curve to report the achieved gain:

    python examples/deploy_tc1_demo.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    # classical/ELL path; CPU by default, DEPLOY_PLATFORM=axon for TPU
    jax.config.update("jax_platforms",
                      os.environ.get("DEPLOY_PLATFORM", "cpu"))

    from amg_ann_tpu.amg.hierarchy import AMGParams
    from amg_ann_tpu.ann.checkpoint import load_model
    from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion
    from amg_ann_tpu.solvers.amg_solver import amg_solve
    from amg_ann_tpu.solvers.ann_solver import ann_amg_solve

    card = json.load(open("data/models/tc1-ref/card.json"))
    model, params, _ = load_model(
        os.path.join("data/models/tc1-ref", card["model"]))

    # seed 99 appears in no dataset; same family/scale the model trained on
    prob = UnstructuredDiffusion(mesh="HyperBall", refinements=2, degree=1,
                                 seed=99, max_diffusion=6.0,
                                 renumbering="cuthill_mckee")
    a, b, _ = prob.build()
    tol = 1e-8 * float(np.linalg.norm(b))
    base = AMGParams(smoother="chebyshev")

    scalars = {"log2ndof": float(np.log2(a.nrows)), "theta": 0.5,
               "freq": float(prob.freq)}
    t0 = time.perf_counter()
    res, theta_star, sigma = ann_amg_solve(
        a, b, model, params, view_size=card["view_size"],
        scalar_inputs=scalars, amg_params=base, tol=tol)
    t_deploy = time.perf_counter() - t0

    # ground truth: measure t = t_setup + t_solve over the sweep grid
    def t_at(th):
        import dataclasses

        r = amg_solve(a, b, dataclasses.replace(base, strong_threshold=th),
                      tol=tol)
        return (r.t_amg_setup + r.t_solve) * 1e-6, r.niters

    thetas = np.arange(0.05, 0.96, 0.05)
    curve = {f"{th:.2f}": t_at(th) for th in thetas}
    ts = {k: v[0] for k, v in curve.items()}
    t_default = ts["0.50"]
    t_star = min(ts.values())
    t_ann = ts[f"{min(thetas, key=lambda t: abs(t - theta_star)):.2f}"]

    # batched serving at the ANN-chosen θ: reuse ONE hierarchy for a
    # stream of right-hand sides (time-stepping / multiple load cases) in
    # one fused device loop vs solving them one by one
    import dataclasses

    from amg_ann_tpu.solvers.amg_solver import amg_solve_batched

    rng = np.random.default_rng(123)
    nb = 8
    bs = rng.random((nb, a.nrows))
    p_star = dataclasses.replace(base, strong_threshold=float(theta_star))
    # warm both jit graphs so the comparison is steady-state serving cost,
    # not first-call compile time
    batch = amg_solve_batched(a, bs, p_star, tol=tol)
    h = batch[0].hierarchy
    amg_solve(a, bs[0], p_star, tol=tol, hierarchy=h)
    t0 = time.perf_counter()
    batch = amg_solve_batched(a, bs, p_star, tol=tol, hierarchy=h)
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    seq = [amg_solve(a, bs[i], p_star, tol=tol, hierarchy=h)
           for i in range(nb)]
    t_seq = time.perf_counter() - t0
    assert all(r.converged for r in batch)
    assert [r.niters for r in batch] == [r.niters for r in seq]

    demo = {
        "problem": "HyperBall r2 d1 seed 99 (unseen)",
        "ndof": int(a.nrows),
        "theta_ann": round(float(theta_star), 4),
        "sigma_hat": round(float(sigma), 5),
        "niters_at_ann_theta": int(res.niters),
        "converged": bool(res.converged),
        "t_total_deploy_s": round(t_deploy, 3),
        "t_curve_s": {k: round(v[0], 4) for k, v in curve.items()},
        "niters_curve": {k: int(v[1]) for k, v in curve.items()},
        "perf_vs_default": round(1.0 - t_ann / t_default, 4),
        "perf_max": round(1.0 - t_star / t_default, 4),
        "batched_serving": {
            "n_rhs": nb,
            "t_batched_s": round(t_batch, 4),
            "t_sequential_s": round(t_seq, 4),
            "speedup": round(t_seq / t_batch, 2),
            "niters_match": True,
        },
    }
    out = "data/models/tc1-ref/deploy_demo.json"
    with open(out, "w") as f:
        json.dump(demo, f, indent=1)
    print(json.dumps(demo))
    print("->", out)


if __name__ == "__main__":
    main()
