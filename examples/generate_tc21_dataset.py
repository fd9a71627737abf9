"""tc2.1 (single-cell diffusion) sweep + view datasets (VERDICT r5 item 7).

The reference's testcase2.1 has three solver modes
(testcase2.1-diffusion-singlecell/src/main.cpp:278-383): 0 = SLEPc
extremal eigenvalues (dataset shipped in data/raw/tc21-ref/eigen, r2),
1 = the hardcoded θ sweep 0.05–0.95/0.0125 (main.cpp:334), 2 = pooling
view. Its datagen grid spans refinements × diffusion exponent
{0,1,2,4,8} × marked points on the main diagonal (datagen.py:30-44).
This driver generates modes 1 and 2 at that grid:

    python examples/generate_tc21_dataset.py [--refinements 2 3 4 5]
        [--out data/raw/tc21-ref] [--times-only | --pooling-only]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/tc21-ref")
    ap.add_argument("--refinements", type=int, nargs="+",
                    default=[2, 3, 4, 5])
    ap.add_argument("--view-size", type=int, default=75)
    ap.add_argument("--pooling-only", action="store_true")
    ap.add_argument("--times-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from amg_ann_tpu.pipeline.configs import tc21_configs
    from amg_ann_tpu.pipeline.datagen import run_config

    def uniq(cfgs):
        # tc21_configs names collide across the marked points of one
        # (ref, d) pair — make them resume-unique
        return [dataclasses.replace(
            c, setting_name=(f"{c.setting_name}_p"
                             f"{c.problem['marked_point'][0]:.2f}"))
            for c in cfgs]

    jobs = []
    if not args.pooling_only:
        jobs.append(("times", uniq(tc21_configs(
            refinements=tuple(args.refinements), solver_mode=1,
            tol=1e-6, rtol_mode=True, smoother="chebyshev"))))
    if not args.times_only:
        pool = [dataclasses.replace(c, solver_mode=2, make_view=True,
                                    view_size=args.view_size,
                                    strong_threshold=(0.0, 0.0, 0.0))
                for c in uniq(tc21_configs(
                    refinements=tuple(args.refinements), solver_mode=2))]
        jobs.append((f"pooling{args.view_size}", pool))
    for sub, cfgs in jobs:
        outdir = os.path.join(args.out, sub)
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, "stats.csv")
        done = set()
        if os.path.exists(path):
            if args.resume:
                with open(path) as fh:
                    done = {ln.split(",", 1)[1].split(",", 1)[0]
                            for ln in fh if "," in ln}
            else:
                os.remove(path)
        t00 = time.time()
        for i, cfg in enumerate(cfgs):
            if cfg.setting_name in done:
                print(f"[{sub} {i + 1}/{len(cfgs)}] {cfg.setting_name} "
                      "resumed (skip)", flush=True)
                continue
            t0 = time.time()
            run_config(cfg, path)
            print(f"[{sub} {i + 1}/{len(cfgs)}] {cfg.setting_name} "
                  f"{time.time() - t0:.1f}s (total {time.time() - t00:.0f}s)",
                  flush=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
