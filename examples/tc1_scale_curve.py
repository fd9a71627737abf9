"""tc1 dataset scale-vs-quality curve (VERDICT r4 item 2).

Trains the shipped tc1 configuration on nested subsets of the training
problems (e.g. 300 → 600 → all) against the SAME held-out test set, and
records held-out P / P_MAX summary stats per subset size — evidence for
(or against) the dataset-scale lever the round-3 review asked to prove.

Run AFTER examples/train_tc2_reference_scale.py --app testcase1-… has
produced data/processed/tc1-ref/{train,test}.

    python examples/tc1_scale_curve.py [--sizes 300 600] [--epochs 120]
"""

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

APP = "testcase1-diffusion-unstructured"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[300, 600])
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--processed", default="data/processed/tc1-ref")
    ap.add_argument("--models", default="data/models/tc1-scale")
    ap.add_argument("--out", default="data/models/tc1-scale/curve.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from amg_ann_tpu.ann.driver import run_hyperparameter_csv
    from amg_ann_tpu.pipeline.analysis import eval_model
    from amg_ann_tpu.pipeline.constants import TEST_VARIABLES

    keys = [k for k in TEST_VARIABLES[APP]]
    train_dir = os.path.join(args.processed, "train")
    stats = pd.read_csv(os.path.join(train_dir, "stats.csv.gz"))
    views = pd.read_csv(os.path.join(train_dir, "view.csv.gz"))
    probs = stats[keys].drop_duplicates().reset_index(drop=True)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(probs))
    print(f"{len(probs)} training problems")

    meta = os.path.join("data", "metadata", APP,
                        "train_hyperparameters.csv")
    os.makedirs(args.models, exist_ok=True)
    results = []
    if os.path.exists(args.out):            # merge: resumable across runs
        with open(args.out) as f:
            results = json.load(f)
    done_sizes = {r["n_problems"] for r in results}
    for size in args.sizes:
        size = min(size, len(probs))
        if size in done_sizes:
            print(f"size {size} already in {args.out} (skip)")
            continue
        sub = probs.iloc[order[:size]]
        s_sub = stats.merge(sub, on=keys)
        v_sub = views.merge(sub, on=[k for k in keys
                                     if k in views.columns])
        d = os.path.join(args.models, f"train_{size}")
        os.makedirs(d, exist_ok=True)
        s_sub.to_csv(os.path.join(d, "stats.csv.gz"), index=False)
        v_sub.to_csv(os.path.join(d, "view.csv.gz"), index=False)

        # train the shipped row from scratch on the subset (no pretrain:
        # the checkpoint itself was trained on the full data)
        mrow = pd.read_csv(meta)
        mrow["pretrain"] = ""
        mrow["epochs"] = args.epochs
        one = os.path.join(args.models, f"_meta_{size}.csv")
        mrow.to_csv(one, index=False)
        hyper = run_hyperparameter_csv(args.models, d, one, verbose=False)
        name = hyper.iloc[0]["name"]
        # targets are tnl in [0, 1]; an MSE above 1 can only mean the
        # heteroscedastic mse_mvar run diverged (observed once at
        # size=600: loss 1e16 while the same protocol trains fine at
        # 300/877) — retry at a lower learning rate
        lr = float(mrow.iloc[0]["lr"])
        for _retry in range(2):
            if float(hyper.iloc[0]["mse"]) <= 1.0:
                break
            lr *= 0.3
            print(f"size {size}: diverged (mse="
                  f"{float(hyper.iloc[0]['mse']):.3g}) — retry lr={lr:g}")
            mrow["lr"] = lr
            mrow.to_csv(one, index=False)
            hyper = run_hyperparameter_csv(args.models, d, one,
                                           verbose=False)
            name = hyper.iloc[0]["name"]
        if float(hyper.iloc[0]["mse"]) > 1.0:
            # still diverged after the retries — a diverged entry must
            # never ship in curve.json (it would poison the scale curve)
            print(f"size {size}: STILL diverged after retries "
                  f"(mse={float(hyper.iloc[0]['mse']):.3g}) — skipped")
            continue
        summary = eval_model(args.models, name,
                             os.path.join(args.processed, "test"))
        done_sizes.add(size)
        results.append({"n_problems": int(size), "model": name,
                        "n_rows": int(len(s_sub)),
                        "best_mse": float(hyper.iloc[0]["mse"]),
                        "heldout": {k: float(v)
                                    for k, v in summary.items()}})
        print(json.dumps(results[-1]), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
