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
    """ρ_k = (res_k / res_0)^{1/k} for k = 1..K, vectorized.

    Same quantity as the reference's per-iteration convergence factor
    (data_preprocessing.py:73-78)."""
    if res.size == 1:
        return np.array([1.0])
    k = np.arange(1, res.size, dtype=float)
    return (res[1:] / res[0]) ** (1.0 / k)


def interp_rho(res: np.ndarray, res_point: float):
    """Fractional iteration count, residual and ρ at the level `res_point`.

    The sweep's histories end at slightly different final residuals; to
    compare ρ across θ on equal footing, find the (fractional, log-linear
    within the final step) iteration index i where this history reaches
    `res_point` and report ρ = (res_point/res_0)^{1/i}. `res_point` must be
    ≥ the final residual (caller passes the max over the sweep). Matches the
    reference's irho semantics (data_preprocessing.py:58-70)."""
    if res.size == 1:
        # 0-iteration solve: scalar degenerate values (the reference
        # returns arrays here, data_preprocessing.py:59-60, which poisons
        # later numeric groupbys — its datasets never hit this case)
        return (1, float(res[0]), 1.0)
    last = res.size - 1
    if res[-1] > res_point:
        raise ValueError("res_point is not the max")
    if res[-1] == res_point:
        return (last, res_point, calc_rho(res)[-1])
    # log-linear inside the final interval [res[-2], res[-1]):
    # i = last - fraction of the last step not yet needed at res_point
    frac = ((np.log(res_point) - np.log(res[-1]))
            / (np.log(res[-2]) - np.log(res[-1])))
    i = last - float(np.clip(frac, 0.0, 1.0))
    return (i, res_point, float((res_point / res[0]) ** (1.0 / i)))


def add_rho_column(df: pd.DataFrame) -> None:
    df["res"] = df["p_res"].apply(
        lambda x: np.array([float(i) for i in f"{x}".strip('"').split(",")]))
    df["rhov"] = df["res"].apply(calc_rho)
    max_last_res = df["res"].apply(lambda x: x[-1]).max()
    df["irhov"] = df["res"].apply(lambda x: interp_rho(x, max_last_res))
    df["rho"] = df["rhov"].apply(lambda x: x[-1])
    df["irho"] = df["irhov"].apply(lambda x: x[-1])


def normalize_rho_t(df, group_cols, cols=("t", "tsg", "rho", "irho")):
    """Per-problem-group normalizations of the cost columns.

    Adds, for every column c in `cols`, `cn` (z-score within the problem's
    θ-sweep) and `cnl` (min-max within the sweep — `tnl` is the shipped
    training target). Same definitions as the reference
    (data_preprocessing.py:81-87); built by direct column assignment."""
    out = df.copy()
    gb = out.groupby(group_cols)
    for c in cols:
        g = gb[c]
        out[c + "n"] = (out[c] - g.transform("mean")) / g.transform("std")
        span = g.transform("max") - g.transform("min")
        out[c + "nl"] = (out[c] - g.transform("min")) / span
    return out


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
        # pandas-3 arrow strings have dtype 'str', not 'object' — classify
        # by numeric-ness, not by not-object-ness
        col_types = df.dtypes.to_dict()
        number_col = [k for k in col_types if k not in gcols
                      and pd.api.types.is_numeric_dtype(df[k])]
        object_col = [k for k in col_types if k not in gcols
                      and not pd.api.types.is_numeric_dtype(df[k])]
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
    # a "problem" is one unique key combination (its whole θ-sweep moves
    # together — the split must never leak a sweep across sets)
    problems = df[keys].drop_duplicates().reset_index(drop=True)
    n_test = int(np.round(test * len(problems)))
    perm = np.random.default_rng(seed).permutation(len(problems))
    problems["_split"] = "train"
    problems.loc[perm[:n_test], "_split"] = "test"
    tagged = df.merge(problems, on=keys, how="left")
    tagged.index = df.index

    view_df = (pd.read_csv(view_csv) if isinstance(view_csv, str)
               else view_csv.copy()).reset_index()
    out = []
    for dataset in ("train", "test"):
        part = tagged[tagged["_split"] == dataset].drop(columns="_split")
        path = os.path.join(out_dir, dataset)
        os.makedirs(path, exist_ok=True)
        part.to_csv(os.path.join(path, "stats.csv.gz"), index=False)
        join = pd.merge(part, view_df, on=keys, suffixes=("", "_view"))
        assert len(join) == len(part), \
            f"{dataset}: view join not 1:1 ({len(join)} vs {len(part)})"
        view_df.loc[join["index"].unique()].to_csv(
            os.path.join(path, "view.csv.gz"), index=False)
        out.append(part)
    return out
