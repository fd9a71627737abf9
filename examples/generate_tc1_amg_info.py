"""Hierarchy-statistics θ-sweep for the tc1 dataset (setup only).

The reference records per-level nrows/nze/sparsity + grid/operator/memory
complexities in every stats row by scraping BoomerAMG's setup dump
(common/amg_solver.h:72-79, parser.h:240-256); data_analysis.py's hexbin
study (jointplot_hexbin, :16-59) then compares argmin_θ(t) with the
argmin-θ of those hierarchy-size proxies. Our times CSVs were generated
without `output_setup_details`, so this driver redoes the HOST setup
(no solves, no device work) per (problem, θ) and writes the stats:

    setting,theta,nrows,nze,sparsity,grid,operator,memory

    python examples/generate_tc1_amg_info.py \
        [--out data/raw/tc1-ref/amg-info/stats.csv]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from generate_tc1_dataset import make_configs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/tc1-ref/amg-info/stats.csv")
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--extended", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from amg_ann_tpu.amg.hierarchy import AMGParams, setup
    from amg_ann_tpu.pipeline.datagen import _build_tc1

    cfgs = make_configs(args.seeds, extended=args.extended)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = {ln.split(",", 1)[0] for ln in fh}
    else:
        with open(args.out, "w") as fh:
            fh.write("setting,theta,nrows,nze,sparsity,grid,operator,"
                     "memory\n")

    t00 = time.time()
    for i, cfg in enumerate(cfgs):
        if cfg.setting_name in done:
            continue
        a, _, _, _, _ = _build_tc1(cfg, 0)
        lo, hi, step = cfg.strong_threshold
        thetas = np.arange(lo, hi, step)
        rows = []
        for theta in thetas:
            h = setup(a, AMGParams(strong_threshold=float(theta),
                                   smoother=cfg.smoother),
                      host_only=True)
            rows.append(",".join(
                [cfg.setting_name, f"{theta:.17e}"]
                + h.stats.as_csv_fields()) + "\n")
        with open(args.out, "a") as fh:
            fh.writelines(rows)
        print(f"[{i + 1}/{len(cfgs)}] {cfg.setting_name} "
              f"({time.time() - t00:.0f}s)", flush=True)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
