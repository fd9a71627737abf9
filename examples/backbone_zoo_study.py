"""Backbone-zoo reality check (VERDICT r4 item 10).

The reference treats its Keras backbone dispatch (cnn_models.py:62-186)
as a hyperparameter alternative to the classic CNN but never publishes a
comparison; our zoo ships downsized family analogs (ann/backbones.py).
This study runs that comparison: train each backbone on the tc2-ref
processed dataset under the SAME protocol as the shipped classic row and
report best val-MSE plus held-out P / P_MAX summary stats.

    python examples/backbone_zoo_study.py \
        [--backbones classic mobilenet mobilenetv2 resnet50v2 densenet121] \
        [--epochs 80]

Writes data/models/backbone-zoo/zoo.json and zoo.md (the table the
round-3 review asked for).
"""

import argparse
import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

APP = "testcase2-diffusion-structured"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbones", nargs="+",
                    default=["classic", "mobilenet", "mobilenetv2",
                             "resnet50v2", "densenet121", "inceptionv3",
                             "efficientnetb0"])
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--processed", default="data/processed/tc2-ref")
    ap.add_argument("--models", default="data/models/backbone-zoo")
    ap.add_argument("--no-resume", dest="resume", action="store_false",
                    help="retrain backbones already present in zoo.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from amg_ann_tpu.ann.driver import run_hyperparameter_csv
    from amg_ann_tpu.pipeline.analysis import eval_model

    meta = os.path.join("data", "metadata", APP,
                        "train_hyperparameters.csv")
    os.makedirs(args.models, exist_ok=True)
    out_json = os.path.join(args.models, "zoo.json")
    results = []
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)
    done = {r["cnn_type"] for r in results} if args.resume else set()
    if not args.resume:
        results = []

    for bb in args.backbones:
        if bb in done:
            print(f"{bb}: already in zoo.json (skip)")
            continue
        mrow = pd.read_csv(meta)
        mrow = mrow.iloc[[0]].copy()
        mrow["cnn_type"] = bb
        mrow["pretrain"] = ""          # same protocol for all: from scratch
        mrow["epochs"] = args.epochs
        one = os.path.join(args.models, f"_meta_{bb}.csv")
        mrow.to_csv(one, index=False)
        hyper = run_hyperparameter_csv(
            args.models, os.path.join(args.processed, "train"), one,
            verbose=False)
        name = hyper.iloc[0]["name"]
        summary = eval_model(args.models, name,
                             os.path.join(args.processed, "test"))
        n_params = None
        spec_path = os.path.join(args.models, name, "spec.json")
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                n_params = json.load(f).get("n_params")
        results.append({"cnn_type": bb, "model": name,
                        "best_mse": float(hyper.iloc[0]["mse"]),
                        "n_params": n_params,
                        "heldout": {k: float(v)
                                    for k, v in summary.items()}})
        print(json.dumps(results[-1]), flush=True)
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)

    # markdown table (keys are get_summary_perf's output contract)
    want = ["frac_good", "mean_gain", "perf_mean", "perf_medi"]
    for r in results:
        missing = [k for k in want if k not in r["heldout"]]
        if missing:
            print(f"WARNING: {r['cnn_type']} summary missing {missing}")
    lines = ["# Backbone zoo on tc2-ref (same protocol, "
             f"{args.epochs} epochs, no pretrain)", "",
             "| cnn_type | params | val MSE | frac_good | mean gain "
             "| realization mean | realization median |",
             "|---|---|---|---|---|---|---|"]
    for r in sorted(results, key=lambda r: r["best_mse"]):
        h = r["heldout"]
        lines.append(
            f"| {r['cnn_type']} | {r.get('n_params') or '?'} "
            f"| {r['best_mse']:.4f} "
            f"| {h.get('frac_good', float('nan')):.2f} "
            f"| {h.get('mean_gain', float('nan')):+.3f} "
            f"| {h.get('perf_mean', float('nan')):.3f} "
            f"| {h.get('perf_medi', float('nan')):.3f} |")
    with open(os.path.join(args.models, "zoo.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out_json)


if __name__ == "__main__":
    main()
