"""Reference-scale tc2 dataset on one TPU chip.

Problems up to 129³ ≈ 2.1M DoFs (the reference's datagen reaches ~2M,
testcase1-…/datagen.py:30), view_size 75 `sum+max+c` — the shipped
training configuration (data/metadata/testcase2-…/train_hyperparameters.csv).

Each θ-sweep runs through the structured fast path (SweepConfig.structured):
one stencil upload + one compiled device setup/solve per grid shape serve
all 19 θ values, which is what makes this dataset feasible in ~1 h of
single-chip time where the classical CPU path would need days.

Usage:
    python examples/generate_tc2_reference_scale.py [--out data/raw/tc2-ref]
        [--sizes 2 3 4] [--seeds 10 5 2] [--pooling-only] [--times-only]

Then:
    python -m amg_ann_tpu.pipeline.cli preprocess --app tc2 \
        --data data/raw/tc2-ref --out data/processed/tc2-ref --pooling 75
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_configs(sizes, seeds_per_size, pattern_size=8, max_eps=6.0):
    from amg_ann_tpu.pipeline.datagen import APP_TC2, SweepConfig

    cfgs = []
    for ref, n_seeds in zip(sizes, seeds_per_size):
        for mode in (1, 2, 3):
            for seed in range(n_seeds):
                rng = np.random.default_rng(1000 * ref + 100 * mode + seed)
                epsv = rng.uniform(0.0, max_eps, pattern_size ** mode)
                cfgs.append(SweepConfig(
                    app=APP_TC2,
                    problem=dict(pattern_size=pattern_size, refinements=ref,
                                 degree=1, mode=mode, epsv=epsv),
                    tol=1e-6, structured=True, smoother="chebyshev",
                    strong_threshold=(0.05, 0.96, 0.05),
                    cycles=1,
                    setting_name=f"tc2ref-r{ref}-m{mode}-s{seed}",
                ))
    return cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/tc2-ref")
    ap.add_argument("--sizes", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("--seeds", type=int, nargs="+", default=[10, 5, 2])
    ap.add_argument("--view-size", type=int, default=75)
    ap.add_argument("--pooling-only", action="store_true")
    ap.add_argument("--times-only", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="keep the existing stats.csv and skip configs whose "
                         "setting name already appears in it")
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (the pooling pass is pure "
                         "host work: use cpu to run alongside a TPU sweep)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from amg_ann_tpu.pipeline.datagen import run_config

    cfgs = make_configs(args.sizes, args.seeds)
    print(f"{len(cfgs)} configurations; backend={jax.default_backend()}")

    jobs = []
    if not args.pooling_only:
        jobs.append(("times", cfgs))
    if not args.times_only:
        pool = [dataclasses.replace(c, make_view=True,
                                    view_size=args.view_size,
                                    strong_threshold=(0.0, 0.0, 0.0))
                for c in cfgs]
        jobs.append((f"pooling{args.view_size}", pool))

    for sub, job_cfgs in jobs:
        outdir = os.path.join(args.out, sub)
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, "stats.csv")
        done = set()
        if os.path.exists(path):
            if args.resume:
                with open(path) as fh:
                    done = {ln.split(",", 1)[0] for ln in fh}
            else:
                os.remove(path)
        t00 = time.time()
        for i, cfg in enumerate(job_cfgs):
            if cfg.setting_name in done:
                print(f"[{sub} {i + 1}/{len(job_cfgs)}] {cfg.setting_name} "
                      f"resumed (skip)", flush=True)
                continue
            t0 = time.time()
            run_config(cfg, path)
            print(f"[{sub} {i + 1}/{len(job_cfgs)}] {cfg.setting_name} "
                  f"{time.time() - t0:.1f}s (total {time.time() - t00:.0f}s)",
                  flush=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
