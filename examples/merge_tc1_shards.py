"""Merge the round-5 fine-θ tc1 shards into data/raw/tc1-ref.

The three shard processes (generate_tc1_dataset.py --shard K 3 --out
data/raw/tc1-fK) each write times/stats.csv and pooling75/stats.csv.
This appends their rows to the main tc1-ref CSVs, skipping setting
names already present (idempotent).

    python examples/merge_tc1_shards.py [--shards data/raw/tc1-f0 ...]
"""

import argparse
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", nargs="+",
                    default=["data/raw/tc1-f0", "data/raw/tc1-f1",
                             "data/raw/tc1-f2"])
    ap.add_argument("--dest", default="data/raw/tc1-ref")
    args = ap.parse_args()

    for sub in ("times", "pooling75"):
        dest = os.path.join(args.dest, sub, "stats.csv")
        have = set()
        if os.path.exists(dest):
            have = set(pd.read_csv(dest, usecols=["setting"])["setting"])
        frames = []
        for sh in args.shards:
            path = os.path.join(sh, sub, "stats.csv")
            if not os.path.exists(path):
                print(f"missing {path} (skip)")
                continue
            df = pd.read_csv(path)
            if sub == "times":
                # drop sweeps cut short by a shard kill: a complete
                # fine-theta sweep has the modal theta count
                cnt = df.groupby("setting")["theta"].nunique()
                full = int(cnt.mode().iloc[0])
                partial = cnt[cnt < full]
                if len(partial):
                    print(f"  dropping {len(partial)} partial sweeps "
                          f"(<{full} thetas): {list(partial.index[:4])}…")
                df = df[df["setting"].isin(cnt[cnt >= full].index)]
            new = df[~df["setting"].isin(have)]
            print(f"{path}: {df['setting'].nunique()} settings, "
                  f"{len(new)} new rows")
            frames.append(new)
        if not frames:
            continue
        add = pd.concat(frames, ignore_index=True)
        if os.path.exists(dest):
            base = pd.read_csv(dest)
            out = pd.concat([base, add], ignore_index=True)
        else:
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            out = add
        out.to_csv(dest, index=False)
        print(f"{dest}: now {out['setting'].nunique()} settings / "
              f"{len(out)} rows")


if __name__ == "__main__":
    main()
