"""Backbone-zoo reality check: train several CNN backbones on tc2-ref.

The reference treats its Keras backbone table as hyperparameter
alternatives (reference: code/data-modeling/cnn_models.py:62-186,
CNN_MODEL_TABLE :174-186) but ships `classic` in all three metadata CSVs.
Round-3 review asked for the comparison the zoo exists for: train ≥4
backbone families on the same tc2-ref data and report best train-mse and
held-out P / P_MAX against `classic` (VERDICT r3 item 10).

    python examples/compare_backbones.py [--epochs 40]
        [--backbones classic mobilenetv2 resnet50v2 densenet121 efficientnetb0]

Writes data/models/backbone-zoo/comparison.json (+ per-model dirs).
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHIPPED_META = ("data/metadata/testcase2-diffusion-structured/"
                "train_hyperparameters.csv")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--backbones", nargs="+",
                    default=["classic", "mobilenetv2", "resnet50v2",
                             "densenet121", "efficientnetb0"])
    ap.add_argument("--processed", default="data/processed/tc2-ref")
    ap.add_argument("--models", default="data/models/backbone-zoo")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from amg_ann_tpu.ann.driver import run_hyperparameter_csv
    from amg_ann_tpu.pipeline.analysis import eval_model

    os.makedirs(args.models, exist_ok=True)
    # the SHIPPED tc2 hyperparameter row, varied ONLY in cnn_type (the
    # reference's intended use of CNN_MODEL_TABLE) + epochs; no pretrain
    # (a classic-shaped checkpoint can't seed a backbone)
    shipped = pd.read_csv(SHIPPED_META).iloc[0].to_dict()
    shipped["epochs"] = args.epochs
    shipped["pretrain"] = ""
    rows = []
    for bb in args.backbones:
        row = dict(shipped)
        row["cnn_type"] = bb
        rows.append(row)

    results = []
    for i, bb in enumerate(args.backbones):
        # one row per run so a crash in one backbone doesn't lose the rest
        one = os.path.join(args.models, f"_row_{bb}.csv")
        pd.DataFrame([rows[i]]).to_csv(one, index=False)
        t0 = time.time()
        try:
            hyper = run_hyperparameter_csv(
                args.models, os.path.join(args.processed, "train"), one,
                verbose=False)
            name = hyper.iloc[0]["name"]
            summary = eval_model(args.models, name,
                                 os.path.join(args.processed, "test"))
            results.append({
                "cnn_type": bb,
                "model": name,
                "trainable_params": int(hyper.iloc[0]["trainable_params"]),
                "best_mse": float(hyper.iloc[0]["mse"]),
                "best_mae": float(hyper.iloc[0]["mae"]),
                "train_s": round(time.time() - t0, 1),
                "heldout": {k: float(v) for k, v in summary.items()},
            })
        except Exception as e:  # noqa: BLE001 — record and continue
            results.append({"cnn_type": bb, "error": repr(e),
                            "train_s": round(time.time() - t0, 1)})
        with open(os.path.join(args.models, "comparison.json"), "w") as f:
            json.dump(results, f, indent=1)
        print(f"[{bb}] done {results[-1]}", flush=True)

    print("wrote", os.path.join(args.models, "comparison.json"))


if __name__ == "__main__":
    main()
