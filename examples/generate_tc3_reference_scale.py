"""Reference-scale tc3 (vector elasticity) dataset on one TPU chip.

Mirrors examples/generate_tc2_reference_scale.py for testcase3: degree-1
θ-sweeps (reference grid 0.15–0.91/0.025, datagen.py:31) through the
unknown-based BLOCK structured fast path (amg/boxmg_block.py) — the block
stencil uploads once per problem and every θ re-runs one compiled device
setup + solve. Sizes by refinement of the 2-macro-cell pattern:
r=3 → 17³ nodes ≈ 14.7k DoFs, r=4 → 33³ ≈ 108k, r=5 → 65³ ≈ 824k.

Usage:
    python examples/generate_tc3_reference_scale.py [--out data/raw/tc3-ref]
        [--refs 3 4 5] [--seeds 6 4 2] [--times-only | --pooling-only]

Then train the shipped tc3 metadata row:
    data/metadata/testcase3-linear-elasticity/train_hyperparameters.csv
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_configs(refs, seeds_per_ref, max_young=2.0):
    from amg_ann_tpu.pipeline.datagen import APP_TC3, SweepConfig

    cfgs = []
    for ref, n_seeds in zip(refs, seeds_per_ref):
        for mode in (1, 3):
            for sharp in (False, True):
                for seed in range(n_seeds):
                    cfgs.append(SweepConfig(
                        app=APP_TC3,
                        problem=dict(pattern_size=2, refinements=ref,
                                     degree=1, mode=mode, seed=seed,
                                     max_young=max_young, sharp=sharp),
                        tol=1e-6, structured=True, smoother="chebyshev",
                        aggressive_levels=2,
                        strong_threshold=(0.15, 0.91, 0.025),
                        cycles=1,
                        setting_name=(f"tc3ref-r{ref}-m{mode}"
                                      f"-sh{int(sharp)}-s{seed}"),
                    ))
    return cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/tc3-ref")
    ap.add_argument("--refs", type=int, nargs="+", default=[3, 4, 5])
    ap.add_argument("--seeds", type=int, nargs="+", default=[6, 4, 2])
    ap.add_argument("--view-size", type=int, default=75)
    ap.add_argument("--pooling-only", action="store_true")
    ap.add_argument("--times-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--platform", default=None)
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

    cfgs = make_configs(args.refs, args.seeds)
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
