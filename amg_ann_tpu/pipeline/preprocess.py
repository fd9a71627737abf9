"""Preprocessing: t(θ) smoothing, convergence factors, normalization, split.

Faithful re-implementation of data_preprocessing.py (reference):
  * t = t_solve + t_amg_setup                        (:110)
  * duplicate (problem, θ) measurements averaged     (:111-118)
  * tsg = Savitzky–Golay(t(θ)) per problem group     (:119-121)
  * ρ_i = exp(ln(res_{i+1}/res_0)/(i+1)); rho = last (:73-78)
  * irho = ρ interpolated at the max common final residual (:58-70)
  * per-group z-score (suffix n) and min-max (suffix nl) of
    t/tsg/rho/irho — `tnl` is the shipped training target (:81-87)
  * group-level (problem-level) train/test split      (:127-150)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import scipy.signal

from .constants import TEST_VARIABLES


def calc_rho(res: np.ndarray) -> np.ndarray:
    if res.size == 1:
        return np.array([1.0])
    return np.array([
        np.exp(np.log(res[i + 1] / res[0]) / (i + 1))
        for i in range(len(res) - 1)
    ])


def interp_rho(res: np.ndarray, res_point: float):
    """(iterations, residual, ρ) interpolated where the history crosses
    res_point (log-linear in the last interval), reference :58-70."""
    if res.size == 1:
        # 0-iteration solve: scalar degenerate values (the reference
        # returns arrays here, data_preprocessing.py:59-60, which poisons
        # later numeric groupbys — its datasets never hit this case)
        return (1, float(res[0]), 1.0)
    if res[-1] == res_point:
        return (len(res) - 1, res_point, calc_rho(res)[-1])
    if res[-1] < res_point:
        lle = float(len(res))
        i = np.interp(np.log(res_point), np.log(res[-1:-3:-1]),
                      [lle - 1, lle - 2])
        irho = np.exp(np.log(res_point / res[0]) / i)
        return (i, res_point, irho)
    raise ValueError("res_point is not the max")


def add_rho_column(df: pd.DataFrame) -> None:
    df["res"] = df["p_res"].apply(
        lambda x: np.array([float(i) for i in f"{x}".strip('"').split(",")]))
    df["rhov"] = df["res"].apply(calc_rho)
    max_last_res = df["res"].apply(lambda x: x[-1]).max()
    df["irhov"] = df["res"].apply(lambda x: interp_rho(x, max_last_res))
    df["rho"] = df["rhov"].apply(lambda x: x[-1])
    df["irho"] = df["irhov"].apply(lambda x: x[-1])


def normalize_rho_t(df, group_cols, cols=("t", "tsg", "rho", "irho")):
    cols = list(cols)
    gb = df.groupby(group_cols)
    norm = gb[cols].transform(lambda x: (x - x.mean()) / x.std())
    norm = norm.rename(columns={k: k + "n" for k in cols})
    norml = gb[cols].transform(lambda x: (x - x.min()) / (x.max() - x.min()))
    norml = norml.rename(columns={k: k + "nl" for k in cols})
    return pd.concat([norm, norml, df], axis=1)


def best_theta(gdf: pd.DataFrame) -> dict:
    """Per-problem oracle gain vs θ=0.5 (reference :90-104)."""
    t_min = gdf["t"].min()
    theta_opt = gdf[gdf["t"] == t_min].iloc[0]["theta"]
    t_default = gdf[(gdf["theta"] - 0.5).abs() < 1e-8].iloc[0]["t"]
    return {
        "t_default": t_default, "t_min": t_min, "theta_opt": theta_opt,
        "gain": (t_default - t_min) / t_default,
    }


def preprocess_data(stats_csv: str | pd.DataFrame, app: str,
                    window: int = 21, order: int = 7) -> pd.DataFrame:
    df = (pd.read_csv(stats_csv) if isinstance(stats_csv, str)
          else stats_csv.copy())
    # tc2.1 writes abbreviated column names (main.cpp:334-338); normalize
    # them (the reference only handles the `res` alias,
    # data_preprocessing.py:41-43 — it never trained on tc2.1 sweeps)
    df = df.rename(columns={"t_setup": "t_amg_setup", "it": "niters",
                            "res": "p_res", "mrs": "maxrowsum",
                            "sym": "symop"})
    keys = TEST_VARIABLES[app]
    df["t"] = df["t_solve"] + df["t_amg_setup"]
    if len(df.groupby(keys + ["theta"])) != len(df):
        # repeated measurements: average numerics, first() the rest
        gcols = keys + ["theta"]
        col_types = df.dtypes.to_dict()
        number_col = [k for k in col_types
                      if col_types[k].name != "object" and k not in gcols]
        object_col = [k for k in col_types
                      if col_types[k].name == "object" and k not in gcols]
        df1 = df.groupby(gcols)[number_col].mean()
        df2 = df.groupby(gcols)[object_col].first()
        df = pd.concat([df1, df2], axis=1).reset_index()
    # adapt the SavGol window to short sweeps (must be odd, > order, <= len)
    df["tsg"] = df.groupby(keys)["t"].transform(
        lambda x: scipy.signal.savgol_filter(
            x, min(window, len(x) - (len(x) + 1) % 2),
            min(order, min(window, len(x) - (len(x) + 1) % 2) - 1)))
    add_rho_column(df)
    # niters is normalized alongside t/ρ (an addition over the reference:
    # iteration count is the deterministic part of the cost signal and a
    # better training target on noisy-walltime hosts)
    df = normalize_rho_t(df, keys, cols=("t", "tsg", "rho", "irho",
                                         "niters"))
    return df


def split_train_validation_test(df: pd.DataFrame, app: str,
                                view_csv: str | pd.DataFrame,
                                out_dir: str, test: float = 0.1,
                                seed: int = 0):
    """Problem-level shuffle split; writes {train,test}/{stats,view}.csv.gz
    (reference :127-150). Returns the two stats frames."""
    keys = TEST_VARIABLES[app]
    gb = df.groupby(keys)
    n_test = int(np.round(test * len(gb)))
    n_train = len(gb) - n_test
    idxs = np.array([0] * n_train + [1] * n_test)
    np.random.default_rng(seed).shuffle(idxs)
    df_idxs = [[], []]
    for i, idx in enumerate(gb.groups.values()):
        df_idxs[idxs[i]].append(idx)
    dfs = [df.loc[np.concatenate(di)] if di else df.iloc[:0]
           for di in df_idxs]

    view_df = (pd.read_csv(view_csv) if isinstance(view_csv, str)
               else view_csv.copy()).reset_index()
    out = []
    for i, dataset in enumerate(["train", "test"]):
        path = os.path.join(out_dir, dataset)
        os.makedirs(path, exist_ok=True)
        dfs[i].to_csv(os.path.join(path, "stats.csv.gz"), index=False)
        join = pd.merge(dfs[i], view_df, on=keys, suffixes=("", "_view"))
        assert len(join) == len(dfs[i]), \
            f"{dataset}: view join not 1:1 ({len(join)} vs {len(dfs[i])})"
        view_idx = join["index"].unique()
        view_df.loc[view_idx].to_csv(os.path.join(path, "view.csv.gz"),
                                     index=False)
        out.append(dfs[i])
    return out
