"""Produce the reference's figure surface for a shipped model directory.

The reference emits its paper figures from model_evaluation.py (pred
scatter :366-413, perf histogram :416-428, cost-scaling :430-565,
σ̄-elbow :568-643) and data_analysis.py (hexbin joint plots :16-59).
This driver regenerates all of them from a trained model's artifacts
(perf_df.csv / pred.csv) into  <models>/figures/ :

    python examples/make_figures.py --app testcase1-diffusion-unstructured

The hexbin panel additionally needs per-(problem, θ) hierarchy stats
(nrows/nze vectors — the reference scrapes them from BoomerAMG's setup
dump, common/amg_solver.h:72-79); pass --amg-info pointing at a CSV from
examples/generate_tc1_amg_info.py to include it.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHORT = {"testcase2-diffusion-structured": "tc2-ref",
         "testcase1-diffusion-unstructured": "tc1-ref",
         "testcase3-linear-elasticity": "tc3-ref"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--app", default="testcase2-diffusion-structured")
    ap.add_argument("--models", default=None)
    ap.add_argument("--model-id", default=None,
                    help="default: the model named in card.json")
    ap.add_argument("--amg-info", default=None,
                    help="CSV with per-(problem,θ) hierarchy stats for "
                         "the hexbin proxy panel")
    ap.add_argument("--raw", default=None,
                    help="raw times stats.csv for t(θ) curve examples")
    ap.add_argument("--no-feature-maps", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from amg_ann_tpu.pipeline import plots
    from amg_ann_tpu.pipeline.analysis import (sigma_bar_study,
                                               theta_proxy_table)

    models = args.models or os.path.join("data", "models", SHORT[args.app])
    card = json.load(open(os.path.join(models, "card.json")))
    model_id = args.model_id or card["model"]
    mdir = os.path.join(models, model_id)
    figdir = os.path.join(models, "figures")
    os.makedirs(figdir, exist_ok=True)
    made = []

    perf_df = pd.read_csv(os.path.join(mdir, "perf_df.csv"))
    err_cols = [c for c in perf_df.columns if c.endswith("nn_err")]

    # prediction-vs-truth scatter over the raw predictions
    pred = pd.read_csv(os.path.join(mdir, "pred.csv"))
    plots.plot_pred_scatter(
        pred["tgt"], pred["pred"],
        sigma=pred["pred_var"] if "pred_var" in pred.columns else None,
        save_path=os.path.join(figdir, "pred_scatter.png"))
    made.append("pred_scatter.png")

    plots.plot_perf_histogram(
        perf_df, save_path=os.path.join(figdir, "perf_histogram.png"))
    made.append("perf_histogram.png")

    if err_cols and perf_df[err_cols[0]].abs().max() > 0:
        study = sigma_bar_study(perf_df, err_col=err_cols[0])
        plots.plot_sigma_bar_elbow(
            study, save_path=os.path.join(figdir, "sigma_bar_elbow.png"))
        made.append("sigma_bar_elbow.png")

    if {"degree", "ndof"} <= set(perf_df.columns):
        # cost-scaling wants the deployed-θ time vs the default-θ time;
        # perf_df records t at θ=0.5 only through perf: reconstruct
        # t(0.5) = t_interp / (1 − perf).
        df = perf_df.copy()
        df["t"] = df["t_interp"] / (1.0 - df["perf"]).replace(0, np.nan)
        plots.plot_cost_scaling(
            df, save_path=os.path.join(figdir, "cost_scaling.png"))
        made.append("cost_scaling.png")

    if args.raw is None:
        cand = os.path.join("data", "raw", SHORT[args.app], "times",
                            "stats.csv")
        args.raw = cand if os.path.exists(cand) else None
    if args.raw:
        from amg_ann_tpu.pipeline.preprocess import preprocess_data

        df = preprocess_data(args.raw, args.app)
        keys = [k for k in ("setting",) if k in df.columns]
        if keys:
            plots.plot_smoothed_data(df, keys, save_dir=figdir,
                                     max_groups=6)
            made += sorted(os.path.basename(p) for p in
                           glob.glob(os.path.join(figdir, "smoothed_*")))

    if not args.no_feature_maps:
        # cnn_filter_visualization parity: activation grids per conv layer
        # + pooled-view gallery over a few processed problems
        from amg_ann_tpu.ann.checkpoint import load_model
        from amg_ann_tpu.ann.driver import (df_to_model_input,
                                            find_metadata, load_data)
        from amg_ann_tpu.pipeline.analysis import feature_maps

        row = find_metadata(models, model_id)
        model, params_m, _ = load_model(mdir)
        test_dir = os.path.join("data", "processed", SHORT[args.app],
                                "test")
        if os.path.isdir(test_dir):
            df = load_data(test_dir, view_size=int(row["view_size"]),
                           join_on=row["join_on"].split(";"),
                           norm_mode=row["norm_mode"],
                           view_type=row["view_type"])
            df = df.drop_duplicates(subset="setting").head(8) \
                if "setting" in df.columns else df.head(8)
            view, pvec, _ = df_to_model_input(
                df, row["inputs"].split(";"), row["tgt"])
            maps = feature_maps(model, params_m, view[:1], pvec[:1])
            plots.plot_feature_maps(maps, save_dir=figdir)
            plots.plot_view_gallery(
                [np.asarray(v)[:, :, 0] for v in view],
                save_path=os.path.join(figdir, "view_gallery.png"),
                log_scale=False)
            made += sorted(os.path.basename(p) for p in
                           glob.glob(os.path.join(figdir, "fmap_*")))
            made.append("view_gallery.png")

    if args.amg_info:
        info = pd.read_csv(args.amg_info)
        if args.raw and "t_solve" not in info.columns:
            # setup-only stats: pull the measured times (and ρ) from the
            # times sweep — the reference has both in one row because its
            # datagen scrapes the setup dump during the timed run.
            from amg_ann_tpu.pipeline.preprocess import preprocess_data

            times = preprocess_data(args.raw, args.app)
            tcols = [c for c in ("t_solve", "t_amg_setup", "rho")
                     if c in times.columns]
            info = info.merge(
                times[["setting", "theta"] + tcols],
                on=["setting", "theta"], how="inner")
        proxy = theta_proxy_table(info, ["setting"])
        proxy.to_csv(os.path.join(figdir, "theta_proxies.csv"),
                     index=False)
        plots.plot_hexbin_proxies(
            proxy, save_path=os.path.join(figdir, "hexbin_proxies.png"))
        made += ["theta_proxies.csv", "hexbin_proxies.png"]

    print(f"{figdir}: " + ", ".join(made))


if __name__ == "__main__":
    main()
