"""Analysis & evaluation wrappers (model_evaluation.py / data_analysis.py
/ cnn_filter_visualization.py parity).

* `eval_model` — the reference's top-level evaluator (:103-163): look up a
  trained model by id in the hyper_params_fit metadata, rebuild its data,
  dump raw predictions, run the θ* deployment simulation, write
  perf_df.csv + summary.json.
* `theta_proxy_table` — data_analysis.py's hexbin study data (:16-59):
  per problem, argmin-θ of measured time vs argmin-θ of hierarchy-size
  proxies (Σn_k, Σnnz_k, Σn_k·nnz_k, ρ).
* `spectrum_table` — tc2.1 conditioning study (:70-157): extremal
  eigenvalues vs h and vs marked-point distance from center.
* `feature_maps` — conv-layer activation maps via flax intermediates
  (cnn_filter_visualization.py:22-35).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..ann.driver import df_to_model_input, find_metadata, load_data
from ..ann.checkpoint import load_model
from ..ann.train import predict
from .evaluate import get_summary_perf, test_model


def eval_model(models_path: str, model_id: str, data_path: str,
               config=None, theta_tobeat: float = 0.5,
               sigma_bar=np.inf, out_prefix: str = "") -> dict:
    """Evaluate a trained model on a processed dataset directory.

    out_prefix prefixes the written pred/perf_df/summary files — pass
    e.g. "cal_" when evaluating the TRAIN split for σ̄ calibration so
    the held-out artifacts are not clobbered."""
    row = find_metadata(models_path, model_id)
    model, params, spec = load_model(os.path.join(models_path, model_id))
    inputs = row["inputs"].split(";")
    join_on = row["join_on"].split(";")

    df = load_data(data_path, view_size=int(row["view_size"]),
                   join_on=join_on, norm_mode=row["norm_mode"],
                   view_type=row["view_type"])

    save_path = os.path.join(models_path, model_id)
    os.makedirs(save_path, exist_ok=True)

    # raw predictions over the full set (reference :127-138)
    view, pvec, target = df_to_model_input(df, inputs, row["tgt"])
    pred = predict(model, params, view, pvec)
    pd.DataFrame({"pred": pred[:, 0],
                  **({"pred_var": pred[:, 1]} if pred.shape[1] > 1 else {}),
                  "tgt": target}).to_csv(
        os.path.join(save_path, f"{out_prefix}pred.csv"), index=False)

    perf_df = test_model(model, params, df, join_on=join_on,
                         tgt=row["tgt"], inputs=inputs, view_column="img",
                         config=config, theta_tobeat=theta_tobeat)
    perf_df.to_csv(os.path.join(save_path, f"{out_prefix}perf_df.csv"),
                   index=False)

    summary = get_summary_perf(perf_df, sigma_bar=sigma_bar)
    with open(os.path.join(save_path, f"{out_prefix}summary.json"),
              "w") as f:
        json.dump({k: float(v) for k, v in summary.items()}, f, indent=1)
    return summary


def theta_proxy_table(df: pd.DataFrame, join_on) -> pd.DataFrame:
    """Per problem: θ_argmin(t) vs θ_argmin of hierarchy proxies.

    Requires output_setup_details columns (nrows, nze quoted vectors) and
    rho. Proxies: Σn_k, Σnnz_k, Σ n_k·nnz_k, ρ (data_analysis.py:16-59).
    """
    def parse_vec(s):
        return np.array([float(x) for x in str(s).strip('"').split(",")])

    rows = []
    for key, g in df.groupby(join_on):
        g = g.sort_values("theta")
        t = g["t_solve"] + g["t_amg_setup"]
        nsum = g["nrows"].apply(lambda s: parse_vec(s).sum())
        zsum = g["nze"].apply(lambda s: parse_vec(s).sum())
        nz = g.apply(lambda r: (parse_vec(r["nrows"])
                                * parse_vec(r["nze"])).sum(), axis=1)
        rec = {"problem": key,
               "theta_t": g["theta"].iloc[np.argmin(t.to_numpy())],
               "theta_nsum": g["theta"].iloc[np.argmin(nsum.to_numpy())],
               "theta_nzsum": g["theta"].iloc[np.argmin(zsum.to_numpy())],
               "theta_nnz": g["theta"].iloc[np.argmin(nz.to_numpy())]}
        if "rho" in g.columns:
            rec["theta_rho"] = g["theta"].iloc[
                np.argmin(g["rho"].to_numpy())]
        rows.append(rec)
    return pd.DataFrame(rows)


def spectrum_table(eigen_df: pd.DataFrame) -> pd.DataFrame:
    """tc2.1 conditioning study: κ = λmax/λmin vs mesh size and marked-
    point distance from the domain center (data_analysis.py:70-157)."""
    df = eigen_df.copy()
    df["h"] = 2.0 ** (-df["mesh_ref"].astype(float))
    df["kappa"] = df["max"] / df["min"]
    df["dist_center"] = df["mpt"].apply(
        lambda s: float(np.linalg.norm(
            [float(x) for x in str(s).strip('"').split(",")])))
    return df[["mesh_ref", "h", "diff", "dist_center", "min", "max",
               "kappa", "solver"]]


def feature_maps(model, params, view, pvec):
    """Per-layer conv activations (cnn_filter_visualization parity).

    Returns {path: activation array} for every intermediate output of the
    CNN trunk.
    """
    _, state = model.apply({"params": params}, view, pvec,
                           capture_intermediates=True, mutable=["intermediates"])

    maps = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}")
        else:
            for arr in tree if isinstance(tree, (tuple, list)) else [tree]:
                if hasattr(arr, "ndim") and arr.ndim == 4:
                    maps[prefix] = np.asarray(arr)

    walk(state["intermediates"], "")
    return maps


def get_elbow_distance(v: np.ndarray) -> np.ndarray:
    """Distance of each point of a sorted curve from its endpoint chord —
    the reference's elbow detector for choosing σ̄
    (model_evaluation.py:568-576)."""
    v = np.asarray(v, dtype=float)
    p1 = np.array([0.0, v[0]])
    p2 = np.array([v.size - 1.0, v[-1]])
    chord = p2 - p1
    norm = np.linalg.norm(chord)
    # vectorized point-to-chord distance (2-D cross product as scalar)
    xs = np.arange(v.size, dtype=float)
    return np.abs(chord[0] * (p1[1] - v) - chord[1] * (p1[0] - xs)) / norm


def sigma_bar_study(perf_df: pd.DataFrame, err_col: str | None = None):
    """σ̄-elbow study (model_evaluation.py:578-643): sort problems by
    descending uncertainty, find the elbow of the √err curve, and report
    the σ̄ threshold at the elbow plus the cumulative bad-prediction rate.

    Returns dict(sigma_bar, elbow_index, err_sorted, frac_bad_cum).
    """
    if err_col is None:
        cands = [c for c in perf_df.columns if c.endswith("nn_err")]
        assert len(cands) == 1, cands
        err_col = cands[0]
    df = perf_df.sort_values(err_col, ascending=False)
    err = np.sqrt(np.maximum(df[err_col].to_numpy(dtype=float), 0.0))
    d = get_elbow_distance(err)
    idx = int(np.argmax(d))
    perf_bad = np.where(df["perf"].to_numpy() < 0, 1, 0)
    frac_bad_cum = np.cumsum(perf_bad[::-1])[::-1] / max(len(df), 1)
    return {
        "sigma_bar": float(err[idx] ** 2),
        "elbow_index": idx,
        "err_sorted": err,
        "frac_bad_cum": frac_bad_cum,
    }


def sigma_bar_calibrated(perf_df: pd.DataFrame, err_col: str | None = None,
                         min_frac_good: float = 0.85,
                         min_kept: int = 10) -> dict:
    """Outcome-calibrated σ̄ (VERDICT r5 item 9).

    The reference's geometric elbow (sigma_bar_study) looks only at the
    σ̂ curve's shape; on tc1 it lands below the 1st σ̂ percentile, so the
    filtered deployment keeps almost nothing but θ=0.5 fallbacks
    (filtered median realization 0.0, r4 card). This selector instead
    uses the OUTCOMES on a calibration set (use the TRAIN-side perf_df —
    never the held-out test set): among candidate thresholds it takes
    the one maximizing the overall mean gain (fallback rows count 0,
    reference filter semantics, model_evaluation.py:27-84) subject to
    frac_good within the kept set ≥ min_frac_good. If no threshold
    meets the constraint (weak σ̂ signal), it returns the
    max-constraint-satisfying threshold with met=False so cards can say
    so instead of shipping a degenerate filter.
    """
    if err_col is None:
        cands = [c for c in perf_df.columns if c.endswith("nn_err")]
        assert len(cands) == 1, cands
        err_col = cands[0]
    err = perf_df[err_col].to_numpy(dtype=float)
    perf = perf_df["perf"].to_numpy(dtype=float)
    # candidate thresholds: midpoints of the sorted σ̂ values + ∞
    es = np.unique(err)
    cand = np.concatenate([(es[1:] + es[:-1]) / 2.0, [np.inf]])
    best = None          # (met, overall_gain, frac_good_kept, s)
    for s in cand:
        kept = err < s
        n_kept = int(kept.sum())
        if n_kept < min_kept:
            continue
        fg = float((perf[kept] >= 0).mean())
        gain = float(np.where(kept, perf, 0.0).mean())
        key = (fg >= min_frac_good, gain if fg >= min_frac_good else fg)
        if best is None or key > best[0]:
            best = (key, {"sigma_bar": float(s), "met": fg >= min_frac_good,
                          "frac_good_kept": fg, "n_kept": n_kept,
                          "overall_mean_gain": gain,
                          "min_frac_good": min_frac_good})
    if best is None:       # degenerate calibration set
        return {"sigma_bar": float(np.inf), "met": False,
                "frac_good_kept": float((perf >= 0).mean()),
                "n_kept": len(perf),
                "overall_mean_gain": float(perf.mean()),
                "min_frac_good": min_frac_good}
    return best[1]


def cost_scaling_table(perf_df: pd.DataFrame) -> pd.DataFrame:
    """Cost-scaling study data (model_evaluation.py:430-565): per degree,
    log-linear fit of t/ndof vs log(ndof) at the default θ and at the
    predicted θ* — the slopes quantify how the ANN changes the empirical
    scaling exponent."""
    rows = []
    for deg, g in perf_df.groupby("degree"):
        x = np.log(g["ndof"].to_numpy(dtype=float))
        for label, col in (("default", "t"), ("predicted", "t_interp")):
            if col not in g.columns:
                continue
            y = g[col].to_numpy(dtype=float) / g["ndof"].to_numpy(dtype=float)
            if len(g) >= 2 and np.ptp(x) > 0:
                slope, intercept = np.polyfit(x, y, 1)
            else:
                slope, intercept = np.nan, np.nan
            rows.append({"degree": deg, "curve": label,
                         "slope": slope, "intercept": intercept,
                         "n_points": len(g)})
    return pd.DataFrame(rows)
