"""Retrain tc1 on the (already preprocessed) fine-theta dataset.

Same train -> eval -> card flow as examples/train_tc2_reference_scale.py
but SKIPS the raw->processed preprocessing step (which re-runs in ~4 min
and is already current under data/processed/tc1-ref), so a session can
budget its wall-clock for the training itself.

    python examples/retrain_tc1_quick.py --epochs 10
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

APP = "testcase1-diffusion-unstructured"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--processed", default="data/processed/tc1-ref")
    ap.add_argument("--models", default="data/models/tc1-ref")
    ap.add_argument("--skip-cal", action="store_true",
                    help="skip the train-side sigma-bar calibration eval")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import pandas as pd

    from amg_ann_tpu.ann.driver import run_hyperparameter_csv
    from amg_ann_tpu.pipeline.analysis import (eval_model,
                                               sigma_bar_calibrated,
                                               sigma_bar_study)

    meta = os.path.join("data", "metadata", APP,
                        "train_hyperparameters.csv")
    hyper = run_hyperparameter_csv(
        args.models, os.path.join(args.processed, "train"), meta,
        epochs_override=args.epochs, verbose=True)
    model_id = hyper.iloc[0]["name"]
    print("trained:", model_id, "mse:", hyper.iloc[0]["mse"], flush=True)

    src = os.path.join(args.models, model_id)
    dst = os.path.join(args.models, "pretrain-model")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst,
                    ignore=shutil.ignore_patterns("history.csv"))

    summary = eval_model(args.models, model_id,
                         os.path.join(args.processed, "test"))
    print("held-out summary:", summary, flush=True)
    perf_df = pd.read_csv(os.path.join(args.models, model_id,
                                       "perf_df.csv"))
    err_cols = [c for c in perf_df.columns if c.endswith("nn_err")]
    train_stats = pd.read_csv(
        os.path.join(args.processed, "train", "stats.csv.gz"))
    card = {
        "app": APP,
        "model": model_id,
        "view_size": 75,
        "view_type": "sum+max+c",
        "norm_mode": "pure_log",
        "n_train_rows": int(len(train_stats)),
        "n_test_problems": int(len(perf_df)),
        "ndof_max": int(train_stats["ndof"].max()),
        "epochs": int(args.epochs),
        "summary": {k: float(v) for k, v in summary.items()},
    }
    err_informative = bool(err_cols) and bool(
        np.nanmax(np.abs(perf_df[err_cols[0]].to_numpy(dtype=float))) > 0)
    if err_informative:
        from amg_ann_tpu.pipeline.evaluate import get_summary_perf

        study = sigma_bar_study(perf_df, err_col=err_cols[0])
        card["sigma_bar_elbow"] = float(study["sigma_bar"])
        filt = get_summary_perf(perf_df, sigma_bar=card["sigma_bar_elbow"])
        card["summary_sigma_filtered"] = {k: float(v)
                                          for k, v in filt.items()}
        if not args.skip_cal:
            eval_model(args.models, model_id,
                       os.path.join(args.processed, "train"),
                       out_prefix="cal_")
            cal_df = pd.read_csv(os.path.join(args.models, model_id,
                                              "cal_perf_df.csv"))
            cal = sigma_bar_calibrated(cal_df, err_col=err_cols[0])
            card["sigma_bar_calibrated"] = cal
            filt_c = get_summary_perf(perf_df, sigma_bar=cal["sigma_bar"])
            kept = perf_df[perf_df[err_cols[0]] < cal["sigma_bar"]]
            filt_c["frac_good_kept"] = (float((kept["perf"] >= 0).mean())
                                        if len(kept) else float("nan"))
            filt_c["n_kept"] = int(len(kept))
            card["summary_sigma_calibrated"] = {k: float(v)
                                                for k, v in filt_c.items()}
    with open(os.path.join(args.models, "card.json"), "w") as f:
        json.dump(card, f, indent=1)
    print("card ->", os.path.join(args.models, "card.json"), flush=True)


if __name__ == "__main__":
    main()
