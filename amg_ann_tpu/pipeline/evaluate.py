"""Evaluation: θ* search and deployment-performance metrics.

Faithful re-implementation of model_evaluation.py (reference):
  * pred_theta (:275-314): iterative grid refinement — N θ values in
    [t0±δ], batch-predict the normalized cost with the SAME view and
    varying θ in the scalar inputs, clip predictions to [0,1], argmin,
    δ /= reduce, repeat `lvls` times. Uncertainty σ̂ = mean(err·(1−pred)).
    Default config {N:101, lvls:1, t0:0.5, delta:0.45, reduce:5} (:104).
  * interp1d_tgt (:166-176): 1-D interpolation of a measured curve with
    end-value fill.
  * test_model (:179-245): per problem, perf = 1 − t(θ*)/t(0.5) and
    perf_max = 1 − t_min/t(0.5) on the real target.
  * get_summary_perf (:27-84): σ̄-filtered summary statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..ann.train import predict as ann_predict

DEFAULT_TEST_CONFIG = {"N": 101, "lvls": 1, "t0": 0.5, "delta": 0.45,
                       "reduce": 5}


def pred_theta(model, params, view_image, scalar_inputs: dict,
               config: dict | None = None, theta_key: str = "theta"):
    """θ* = argmin of the predicted cost over a refining θ grid.

    view_image: (vs, vs, C) normalized image of the problem's matrix.
    scalar_inputs: ordered {name: value} for the parameter vector; the
    θ entry is swept. Returns (theta*, predicted cost, σ̂).
    """
    cfg = dict(DEFAULT_TEST_CONFIG, **(config or {}))
    n, lvls = cfg["N"], cfg["lvls"]
    t0, delta, reduce = cfg["t0"], cfg["delta"], cfg["reduce"]
    names = list(scalar_inputs)
    t_idx = names.index(theta_key)

    view = np.repeat(np.asarray(view_image, dtype=np.float32)[None], n,
                     axis=0)
    err = 0.0
    for _ in range(lvls):
        thetas = np.linspace(t0 - delta, t0 + delta, n)
        cols = [np.repeat(np.float32(scalar_inputs[k]), n)
                if k != theta_key else thetas for k in names]
        pvec = np.column_stack(cols).astype(np.float32)
        pred = ann_predict(model, params, view, pvec)
        if pred.ndim > 1 and pred.shape[1] > 1:
            err = np.sqrt(np.maximum(pred[:, 1], 0.0))
            pred = pred[:, 0]
        else:
            pred = pred[:, 0]
            err = np.zeros_like(pred)
        pred = np.clip(pred, 0.0, 1.0)
        index = int(np.argmin(pred))
        t0 = float(pvec[index, t_idx])
        tgt_pred = float(pred[index])
        delta /= reduce
    return t0, tgt_pred, float(np.mean(err * (1.0 - pred)))


import functools


@functools.lru_cache(maxsize=32)
def _pred_theta_jit(model, n, lvls, delta0, reduce, t_idx, n_names):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, view, base, t0):
        view_b = jnp.broadcast_to(view[None], (n,) + view.shape)
        delta = delta0
        tgt = jnp.float32(0.0)
        sig = jnp.float32(0.0)
        for _ in range(lvls):                       # static unroll
            thetas = jnp.linspace(t0 - delta, t0 + delta, n,
                                  dtype=jnp.float32)
            pvec = jnp.broadcast_to(base[None], (n, n_names))
            pvec = pvec.at[:, t_idx].set(thetas)
            out = model.apply({"params": params}, view_b, pvec)
            if out.ndim > 1 and out.shape[1] > 1:
                err = jnp.sqrt(jnp.maximum(out[:, 1], 0.0))
                pred = out[:, 0]
            else:
                pred = out[:, 0]
                err = jnp.zeros_like(pred)
            pred = jnp.clip(pred, 0.0, 1.0)
            idx = jnp.argmin(pred)
            t0 = pvec[idx, t_idx]
            tgt = pred[idx]
            sig = jnp.mean(err * (1.0 - pred))
            delta = delta / reduce
        return t0, tgt, sig

    return run


def pred_theta_device(model, params, view_image, scalar_inputs: dict,
                      config: dict | None = None, theta_key: str = "theta"):
    """Device-resident twin of pred_theta — the DEPLOYMENT path.

    The view broadcasts on device (pred_theta re-uploads an (N, vs, vs,
    C) repeated batch through the tunnel every call — ~3 MB at N=101),
    the whole refinement loop runs inside one jit, and only three
    scalars come back. Same math as pred_theta (the evaluation oracle);
    tests pin the two against each other."""
    import jax
    import jax.numpy as jnp

    cfg = dict(DEFAULT_TEST_CONFIG, **(config or {}))
    names = list(scalar_inputs)
    t_idx = names.index(theta_key)
    base = np.array([np.float32(scalar_inputs[k]) for k in names],
                    dtype=np.float32)
    fn = _pred_theta_jit(model, cfg["N"], cfg["lvls"],
                         float(cfg["delta"]), float(cfg["reduce"]),
                         t_idx, len(names))
    out = fn(params, jnp.asarray(view_image, dtype=jnp.float32),
             jnp.asarray(base), jnp.float32(cfg["t0"]))
    th, tgt, sig = jax.device_get(out)     # ONE host sync (tunnel RTT)
    return float(th), float(tgt), float(sig)


def interp1d_tgt(curve_df: pd.DataFrame, theta: float, tgt: str):
    """Interpolate the measured tgt(θ) curve at theta with end-fill."""
    x = np.asarray(curve_df["theta"], dtype=float)
    y = np.asarray(curve_df[tgt], dtype=float)
    order = np.argsort(x)
    x, y = x[order], y[order]
    return float(np.interp(theta, x, y))  # np.interp clamps at the ends


def test_model(model, params, df: pd.DataFrame, *, join_on, tgt: str,
               inputs, view_column: str, config=None, theta_tobeat=0.5,
               perf_tgt: str = "t") -> pd.DataFrame:
    """Deployment simulation over every problem at θ=0.5.

    df must carry: theta, tgt, perf_tgt, the scalar input columns, and
    `view_column` holding each row's (vs, vs, C) normalized image.
    """
    tobeat = df[np.isclose(df["theta"], theta_tobeat)].reset_index(drop=True)
    groups = {k: g for k, g in df.groupby(join_on)}
    records = []
    for _, row in tobeat.iterrows():
        curve = groups[tuple(row[k] for k in join_on)].sort_values("theta")
        i_min = curve[tgt].idxmin()
        theta_nn, tgt_nn, sigma = pred_theta(
            model, params, row[view_column],
            {k: row[k] for k in inputs}, config)
        rec = {
            "theta_argmin": curve.loc[i_min, "theta"],
            f"{tgt}_min": curve.loc[i_min, tgt],
            f"{perf_tgt}_min": curve.loc[i_min, perf_tgt],
            "theta_nn": theta_nn,
            f"{tgt}_nn": tgt_nn,
            f"{tgt}_nn_err": sigma,
            f"{tgt}_interp": interp1d_tgt(curve, theta_nn, tgt),
            f"{perf_tgt}_interp": interp1d_tgt(curve, theta_nn, perf_tgt),
        }
        base_tgt = row[tgt] + (row[tgt] == 0.0)
        rec[f"perf_{tgt}"] = 1 - rec[f"{tgt}_interp"] / base_tgt
        rec[f"perf_max_{tgt}"] = 1 - rec[f"{tgt}_min"] / base_tgt
        rec["perf"] = 1 - rec[f"{perf_tgt}_interp"] / row[perf_tgt]
        rec["perf_max"] = 1 - rec[f"{perf_tgt}_min"] / row[perf_tgt]
        records.append({**{k: row[k] for k in join_on}, **rec})
    return pd.DataFrame(records)


def perf_realization(perf, perf_max):
    return perf / perf_max if perf_max != 0 else 1.0


def get_summary_perf(perf_df: pd.DataFrame, sigma_bar=np.inf,
                     err_col: str | None = None) -> dict:
    """σ̄-filtered summary (reference :27-84): predictions with error
    indicator ≥ σ̄ fall back to θ=0.5 (perf := 0)."""
    perf_df = perf_df.copy()
    if err_col is None:
        cands = [c for c in perf_df.columns if c.endswith("nn_err")]
        assert len(cands) == 1, cands
        err_col = cands[0]
    perf_df["perf"] = np.where(perf_df[err_col] < sigma_bar,
                               perf_df["perf"], 0.0)
    good = perf_df[perf_df["perf"] >= 0]
    bad = perf_df[perf_df["perf"] < 0]
    realization = good.apply(
        lambda x: perf_realization(x["perf"], x["perf_max"]), axis=1)
    return {
        "frac_good": len(good) / len(perf_df) if len(perf_df) else 0.0,
        "mean_gain": perf_df["perf"].mean(),
        "medi_gain": perf_df["perf"].median(),
        "perf_mean": realization.mean() if len(good) else np.nan,
        "perf_medi": realization.median() if len(good) else np.nan,
        "lost_mean": bad["perf"].mean() if len(bad) else 0.0,
        "lost_medi": bad["perf"].median() if len(bad) else 0.0,
    }
