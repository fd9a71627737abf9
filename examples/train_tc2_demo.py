"""End-to-end AMG-ANN demonstration on testcase2-class problems.

Generates a real θ-sweep dataset (classical PMIS hierarchies — the path
with genuine θ-sensitivity), trains the θ-cost CNN on it, and evaluates
the deployment metric P = 1 − t(θ*)/t(0.5) on held-out problems —
the reference's headline experiment (model_evaluation.py) at reduced scale.

Run:  python examples/train_tc2_demo.py [--n-problems 24] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pandas as pd

from amg_ann_tpu.ann import ThetaCostModel, fit, stack_channels
from amg_ann_tpu.pipeline import (
    SweepConfig, generate_dataset, get_summary_perf, preprocess_data,
    test_model,
)

APP = "testcase2-diffusion-structured"
VIEW_SIZE = 24


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-problems", type=int, default=36)
    ap.add_argument("--refinements", type=int, default=4)
    ap.add_argument("--tgt", default="tnl",
                    help="training target: tnl (time; the reference signal — "
                         "needs refinements>=4 so setup time dominates host "
                         "noise) or nitersnl (deterministic; small problems)")
    ap.add_argument("--perf-tgt", default="t")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--out", default="/tmp/amg_ann_demo")
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    configs = []
    for i in range(args.n_problems):
        mode = int(rng.integers(1, 4))
        configs.append(SweepConfig(
            problem=dict(pattern_size=2, refinements=args.refinements,
                         mode=mode,
                         epsv=tuple(rng.uniform(0, 5, 2 ** mode))),
            strong_threshold=(0.05, 0.96, 0.05),
            rtol_mode=True, setting_name=f"p{i}"))

    t0 = time.time()
    times = generate_dataset(configs, args.out)
    pools = generate_dataset(configs, args.out, pooling_size=VIEW_SIZE)
    print(f"[{time.time()-t0:.0f}s] dataset: "
          f"{len(pd.read_csv(times))} sweep rows")

    df = preprocess_data(times, APP, window=9, order=3)
    vdf = pd.read_csv(pools)

    def parse(s, d):
        return np.array([d(x) for x in str(s).split(",")]).reshape(
            VIEW_SIZE, VIEW_SIZE)

    vdf["img"] = vdf.apply(lambda r: stack_channels(
        parse(r["view"], float), parse(r["view_max_pp"], float),
        parse(r["view_max_np"], float), parse(r["view_count"], int),
        "sum+max+c", "pure_log").astype(np.float32), axis=1)
    merged = pd.merge(df, vdf[["epsv", "mode", "img"]],
                      on=["epsv", "mode"])
    assert len(merged) == len(df)
    merged["log2ndof"] = np.log2(merged["ndof"])

    # problem-level split
    problems = np.array(merged["epsv"].unique(), dtype=object)
    rng.shuffle(problems)
    n_test = max(2, len(problems) // 5)
    test_eps = set(problems[:n_test])
    train_df = merged[~merged["epsv"].isin(test_eps)]
    test_df = merged[merged["epsv"].isin(test_eps)]
    print(f"train problems: {len(problems)-n_test}, test: {n_test}")

    inputs = ["log2ndof", "theta", "mode"]
    view = np.stack(train_df["img"].to_numpy())
    pvec = train_df[inputs].to_numpy(np.float32)
    tgt = train_df[args.tgt].to_numpy(np.float32)

    model = ThetaCostModel(nparams=3, wide1=16, depth1=2, wide2=16,
                           depth2=1, bottleneck=16, wide3=48, depth3=2,
                           learn_err=True)
    t0 = time.time()
    res = fit(model, view, pvec, tgt, epochs=args.epochs, batch_size=32,
              lr=2e-3, patience=8, seed=0)
    print(f"[{time.time()-t0:.0f}s] trained: best_loss={res.best_loss:.4f}")

    for name, d in (("train", train_df), ("test", test_df)):
        perf = test_model(model, res.best_params, d, join_on=["epsv"],
                          tgt=args.tgt, inputs=inputs, view_column="img",
                          config={"N": 51, "lvls": 1},
                          perf_tgt=args.perf_tgt)
        s = get_summary_perf(perf)
        print(f"{name}: frac_good={s['frac_good']:.2f} "
              f"mean_gain={s['mean_gain']*100:.1f}% "
              f"median_gain={s['medi_gain']*100:.1f}% "
              f"(oracle max mean "
              f"{np.mean(perf['perf_max'])*100:.1f}%)")
        if name == "test":
            with open(os.path.join(args.out, "summary.json"), "w") as f:
                json.dump({k: float(v) for k, v in s.items()}, f)
            perf.to_csv(os.path.join(args.out, "perf_test.csv"), index=False)


if __name__ == "__main__":
    main()
