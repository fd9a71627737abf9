"""Stage attribution for the warm deployment predict at 129^3
(VERDICT r5 item 3 — third round of t_predict > 0.5 s; profile FIRST).

Times, warm, each stage of predict_theta_for_matrix's stencil path:
  1. make_view_stencil        (device pooling from resident stencil)
  2. stack_channels_device    (normalize + stack, one jit)
  3. pred_theta_device        (whole theta search, one jit + 3-scalar fetch)
and the end-to-end predict_theta_for_matrix call, so dispatch overhead
vs device time is attributable. Every timing is min-of-3 with a hard
host-fetch sync (block_until_ready does not sync on axon).

Usage: python bench/predict_profile_tpu.py [n=129] [model_dir]
Writes bench/predict_profile_<n>.json
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


def timed(fn, reps=3):
    fn()                                   # warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    model_dir = sys.argv[2] if len(sys.argv) > 2 else "data/models/tc2-ref"

    from amg_ann_tpu.ann.checkpoint import load_model
    from amg_ann_tpu.ann.normalize import stack_channels_device
    from amg_ann_tpu.pipeline.evaluate import pred_theta_device
    from amg_ann_tpu.solvers.ann_solver import predict_theta_for_matrix
    from amg_ann_tpu.view.pooling import make_view_stencil

    cands = sorted(d for d in os.listdir(model_dir)
                   if d.startswith("model")
                   and os.path.isdir(os.path.join(model_dir, d)))
    model, params_nn, spec = load_model(os.path.join(model_dir, cands[-1]))
    vs = spec["view_size"]

    rng = np.random.default_rng(0)
    gs = (n, n, n)
    s0 = rng.standard_normal((27, n * n * n)).astype(np.float32)
    stencil = jax.block_until_ready(jnp.asarray(s0))
    scal = {"log2ndof": float(np.log2(n ** 3)), "theta": 0.5,
            "degree": 1.0}

    report = {"n": n, "view_size": vs, "model": cands[-1]}

    view = make_view_stencil(stencil, gs, vs)
    report["t_view_s"] = timed(
        lambda: float(make_view_stencil(stencil, gs, vs).sum[0, 0]))
    img_host = None

    def stack():
        nonlocal img_host
        img = stack_channels_device(view, "sum+max+c", "pure_log")
        img_host = img
        return float(img[0, 0, 0])

    report["t_stack_s"] = timed(stack)
    report["t_pred_s"] = timed(
        lambda: pred_theta_device(model, params_nn, img_host, scal))
    report["t_end_to_end_s"] = timed(
        lambda: predict_theta_for_matrix(
            None, model, params_nn, view_size=vs, scalar_inputs=scal,
            stencil=stencil, grid_shape=gs))
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"predict_profile_{n}.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
