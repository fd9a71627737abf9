"""Training driver: hyperparameter-CSV-driven runs (train_ann.py parity).

The reference's training config system is a CSV under data/metadata/<app>/
consumed row by row (train_ann.py:339-424): each row names the CNN shape,
view type/normalization, scalar inputs, target column, batch/lr/patience,
optional pretrain checkpoint and layer freezing; results (trainable param
counts, best mse/mae) are written back into hyper_params_fit_<ts>.csv,
which evaluation later scans (model_evaluation.py find_metadata :87-100).

`load_data` mirrors train_ann.load_data (:316-336): read the processed
stats.csv.gz, read+parse view.csv.gz (flattened images → arrays), join 1:1
on the row's join keys, normalize with the requested modes, add log2ndof.
"""

from __future__ import annotations

import datetime
import os
import re

import numpy as np
import pandas as pd
import jax

from .checkpoint import load_model, save_model
from .models import ThetaCostModel
from .normalize import VIEW_TYPE_CHANNELS, stack_channels
from .train import fit

TO_DROP = [
    "Unnamed: 0", "setting", "maxrowsum", "symop", "tol",
    "nrows", "nze", "sparsity", "grid", "operator", "memory",
    "p_res", "version", "res", "rhov", "irhov",
]


def parse_view_field(s: str, view_size: int, dtype=float) -> np.ndarray:
    nums = np.array([dtype(x) for x in str(s).strip('"').split(",")])
    assert nums.size == view_size ** 2, "view wrong size"
    return nums.reshape(view_size, view_size)


def load_view_df(path: str, view_size: int) -> pd.DataFrame:
    df = pd.read_csv(path)
    df = df[df["view_size"] == view_size].reset_index(drop=True).copy()
    for field in ("view", "view_max_pp", "view_max_np"):
        df[field] = df[field].apply(
            lambda s: parse_view_field(s, view_size, float))
    df["view_count"] = df["view_count"].apply(
        lambda s: parse_view_field(s, view_size, int))
    if "setting" in df.columns:
        df = df.drop(columns=["setting"])
    return df


def load_data(data_path: str, *, view_size: int, join_on: list,
              norm_mode: str, view_type: str) -> pd.DataFrame:
    """Join processed time-stats with views; build the image column."""
    stats = pd.read_csv(os.path.join(data_path, "stats.csv.gz"))
    stats = stats.drop(columns=list(set(stats.columns) & set(TO_DROP)))
    views = load_view_df(os.path.join(data_path, "view.csv.gz"), view_size)
    df = pd.merge(stats, views, on=join_on, how="inner",
                  suffixes=("", "_y"))
    assert len(df) == len(stats), \
        f"view join not 1:1: {len(df)} vs {len(stats)}"
    df["img"] = df.apply(
        lambda r: stack_channels(r["view"], r["view_max_pp"],
                                 r["view_max_np"], r["view_count"],
                                 view_type, norm_mode).astype(np.float32),
        axis=1)
    df["log2ndof"] = np.log2(df["ndof"])
    return df


def df_to_model_input(df: pd.DataFrame, inputs: list, tgt: str):
    view = np.stack(df["img"].to_numpy())
    pvec = df[inputs].to_numpy(dtype=np.float32)
    target = df[tgt].to_numpy(dtype=np.float32)
    return view, pvec, target


def run_hyperparameter_csv(output_dir: str, data_dir: str,
                           metadata_path: str, *, epochs_override=None,
                           verbose=False) -> pd.DataFrame:
    """train_ann.main analog: one model per hyperparameter row."""
    hyper_df = pd.read_csv(metadata_path)
    ts_global = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    os.makedirs(output_dir, exist_ok=True)

    for index, row in hyper_df.iterrows():
        inputs = row["inputs"].split(";")
        join_on = row["join_on"].split(";")
        df = load_data(data_dir, view_size=int(row["view_size"]),
                       join_on=join_on, norm_mode=row["norm_mode"],
                       view_type=row["view_type"])
        df = df.sample(frac=1.0, replace=False, random_state=0)
        view, pvec, target = df_to_model_input(df, inputs, row["tgt"])

        ts_local = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S_%f")
        name = f"model{ts_local}"
        model_path = os.path.join(output_dir, name)

        state = None
        pretrain_path = None
        if "pretrain" in row and isinstance(row["pretrain"], str) \
                and row["pretrain"]:
            cand = os.path.join(output_dir, row["pretrain"])
            if os.path.isdir(cand):
                pretrain_path = cand
            else:
                print(f"[driver] pretrain checkpoint {cand!r} not found; "
                      "training from scratch")
        if pretrain_path is not None:
            model, params, spec = load_model(pretrain_path)
            from .train import create_state

            state = create_state(model, jax.random.PRNGKey(0),
                                 view.shape[1:], lr=float(row["lr"]))
            state = state.replace(params=params)
        else:
            model = ThetaCostModel(
                nparams=len(inputs), cnn_type=row.get("cnn_type", "classic"),
                wide1=int(row["w1"]), depth1=int(row["d1"]),
                wide2=int(row["w2"]), depth2=int(row["d2"]),
                bottleneck=int(row["bn"]), wide3=int(row["w3"]),
                depth3=int(row["d3"]), kernel_size=int(row["kernel_size"]),
                act=row.get("act", "relu"),
                learn_err=bool(row["learn_err"]))

        epochs = int(epochs_override or row["epochs"])
        freeze = int(row["freeze"]) if "freeze" in row and \
            pd.notna(row.get("freeze")) else 0
        result = fit(model, view, pvec, target, epochs=epochs,
                     batch_size=int(row["batch_size"]),
                     validation_split=float(row.get("val_split", 0.0)),
                     patience=int(row["patience"]), lr=float(row["lr"]),
                     state=state, verbose=verbose, freeze=freeze)

        save_model(model_path, model, result.best_params,
                   view_size=int(row["view_size"]),
                   channels=VIEW_TYPE_CHANNELS[row["view_type"]])
        pd.DataFrame(result.history).to_csv(
            os.path.join(model_path, "history.csv"), index=False)

        hyper_df.at[index, "name"] = name
        n_params = sum(p.size for p in jax.tree.leaves(result.best_params))
        hyper_df.at[index, "trainable_params"] = int(n_params)
        hist = pd.DataFrame(result.history)
        hyper_df.at[index, "mse"] = hist["mse"].min()
        hyper_df.at[index, "mae"] = hist["mae"].min()
        hyper_df.to_csv(os.path.join(
            output_dir, f"hyper_params_fit_{ts_global}.csv"), index=False)
    return hyper_df


def find_metadata(models_path: str, model_id: str) -> pd.Series:
    """Scan hyper_params_fit_*.csv for the row describing model_id
    (model_evaluation.py:87-100)."""
    pat = re.compile(r"hyper_params_fit_[0-9_\-]+\.csv")
    for fn in os.listdir(models_path):
        if pat.fullmatch(fn):
            hdf = pd.read_csv(os.path.join(models_path, fn))
            row = hdf[hdf["name"] == model_id]
            if len(row) == 1:
                return row.iloc[0]
    raise LookupError(f"no metadata row for {model_id!r} in {models_path}")
