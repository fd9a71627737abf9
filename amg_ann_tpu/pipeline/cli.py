"""Command-line entry points (00_data-generation.py / 01_data-preprocess.py
parity).

    python -m amg_ann_tpu.pipeline.cli generate --app tc2 --out data/raw/tc2 \
        [--pooling 75] [--n 8] [--threads 4]
    python -m amg_ann_tpu.pipeline.cli preprocess --app tc2 \
        --data data/raw/tc2 --out data/processed/tc2 \
        [--pooling 75] [--window 21] [--order 7] [--test 0.1]
    python -m amg_ann_tpu.pipeline.cli train --data data/processed/tc2/train \
        --metadata metadata.csv --out models/

The generate step fans configurations out over worker threads like the
reference orchestrator (00_data-generation.py:106-116) — each thread gets
an interleaved slice (`configs[i::n_threads]`) and writes its own CSV,
concatenated at the end.
"""

from __future__ import annotations

import argparse
import os
import threading

import pandas as pd

from . import configs as config_mod
from .datagen import APP_TC1, APP_TC2, APP_TC21, APP_TC3, run_config

APP_ALIASES = {
    "tc1": APP_TC1, "tc2": APP_TC2, "tc21": APP_TC21, "tc2.1": APP_TC21,
    "tc3": APP_TC3,
}
CONFIG_FACTORY = {
    APP_TC1: config_mod.tc1_configs, APP_TC2: config_mod.tc2_configs,
    APP_TC21: config_mod.tc21_configs, APP_TC3: config_mod.tc3_configs,
}


def cmd_generate(args):
    import dataclasses

    app = APP_ALIASES.get(args.app, args.app)
    cfgs = CONFIG_FACTORY[app]()
    if args.n:
        cfgs = cfgs[: args.n]
    sub = f"pooling{args.pooling}" if args.pooling else "times"
    outdir = os.path.join(args.out, sub)
    os.makedirs(outdir, exist_ok=True)
    if args.pooling:
        cfgs = [dataclasses.replace(c, make_view=True,
                                    view_size=args.pooling,
                                    strong_threshold=(0.0, 0.0, 0.0))
                for c in cfgs]

    # interleaved thread fan-out, per-thread CSV (00_data-generation.py)
    def worker(tid):
        path = os.path.join(outdir, f"stats_{tid}.csv")
        if os.path.exists(path):
            os.remove(path)
        for cfg in cfgs[tid::args.threads]:
            run_config(cfg, path)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    parts = [os.path.join(outdir, f"stats_{t}.csv")
             for t in range(args.threads)]
    frames = [pd.read_csv(p) for p in parts if os.path.exists(p)]
    final = os.path.join(outdir, "stats.csv")
    pd.concat(frames, ignore_index=True).to_csv(final, index=False)
    for p in parts:
        os.remove(p)
    print(f"wrote {final} ({sum(len(f) for f in frames)} rows)")


def cmd_preprocess(args):
    from .preprocess import preprocess_data, split_train_validation_test

    app = APP_ALIASES.get(args.app, args.app)
    times = os.path.join(args.data, "times", "stats.csv")
    pool = os.path.join(args.data, f"pooling{args.pooling}", "stats.csv")
    df = preprocess_data(times, app, window=args.window, order=args.order)
    view_df = pd.read_csv(pool)
    split_train_validation_test(df, app, view_df, args.out, test=args.test)
    print(f"wrote {args.out}/{{train,test}}/{{stats,view}}.csv.gz")


def cmd_train(args):
    from ..ann.driver import run_hyperparameter_csv

    run_hyperparameter_csv(args.out, args.data, args.metadata,
                           verbose=args.verbose)


def main(argv=None):
    p = argparse.ArgumentParser(prog="amg_ann_tpu.pipeline")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--app", required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--pooling", type=int, default=0)
    g.add_argument("--n", type=int, default=0, help="limit #configs")
    g.add_argument("--threads", type=int, default=1)
    g.set_defaults(fn=cmd_generate)

    q = sub.add_parser("preprocess")
    q.add_argument("--app", required=True)
    q.add_argument("--data", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--pooling", type=int, default=75)
    q.add_argument("--window", type=int, default=21)
    q.add_argument("--order", type=int, default=7)
    q.add_argument("--test", type=float, default=0.1)
    q.set_defaults(fn=cmd_preprocess)

    t = sub.add_parser("train")
    t.add_argument("--data", required=True)
    t.add_argument("--metadata", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--verbose", action="store_true")
    t.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
