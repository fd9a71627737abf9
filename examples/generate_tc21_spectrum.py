"""tc2.1 conditioning study: extremal-eigenvalue dataset + spectrum figure.

The reference's testcase2.1 mode-0 runs SLEPc extremal-eigenvalue solves
per (mesh refinement, diffusion exponent, marked point) and
data_analysis.py:70-157 studies κ = λmax/λmin against h and against the
marked-point distance from the domain center. This driver reproduces the
dataset (pipeline/datagen.py::_write_eigen_rows — Lanczos ×2 + dense
verification on small systems) and the figure.

    python examples/generate_tc21_spectrum.py [--out data/raw/tc21-ref]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/tc21-ref")
    ap.add_argument("--refinements", default="2,3,4")
    ap.add_argument("--figdir", default="data/models/tc21-ref")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # κ reaches 10^8 (diffusion_exp 8): f32 Lanczos cannot resolve λ_min
    # and diverges; the reference's SLEPc runs in f64
    jax.config.update("jax_enable_x64", True)

    import pandas as pd

    from amg_ann_tpu.pipeline.analysis import spectrum_table
    from amg_ann_tpu.pipeline.configs import tc21_configs
    from amg_ann_tpu.pipeline.datagen import run_config
    from amg_ann_tpu.pipeline.plots import plot_spectrum

    refs = tuple(int(r) for r in args.refinements.split(","))
    cfgs = tc21_configs(refinements=refs, solver_mode=0)
    outdir = os.path.join(args.out, "eigen")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "stats.csv")
    if os.path.exists(path):
        os.remove(path)
    t00 = time.time()
    for i, cfg in enumerate(cfgs):
        run_config(cfg, path)
        print(f"[{i + 1}/{len(cfgs)}] {cfg.setting_name} "
              f"({time.time() - t00:.0f}s)", flush=True)

    df = spectrum_table(pd.read_csv(path))
    os.makedirs(args.figdir, exist_ok=True)
    df.to_csv(os.path.join(args.figdir, "spectrum.csv"), index=False)
    plot_spectrum(df, save_path=os.path.join(args.figdir, "spectrum.png"))
    print("wrote", path, "and", os.path.join(args.figdir, "spectrum.png"))


if __name__ == "__main__":
    main()
