"""Diagnostic plots (matplotlib) — the reference's figure surface:
smoothed t(θ) curves (data_preprocessing.plot_smoothed_data:14-37),
prediction-vs-truth scatter colored by σ̂ (model_evaluation:366-413),
performance histogram (:416-428), pooled-view gallery
(cnn_filter_visualization.pooling_visualization:121-146).

All functions return the figure and optionally save; no plt.show() —
headless-safe (Agg backend).
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_smoothed_data(df, keys, save_dir=None, max_groups=16,
                       window=21, order=7):
    """t(θ) raw vs Savitzky–Golay per problem group."""
    import scipy.signal

    figs = []
    for i, (name, g) in enumerate(df.groupby(keys)):
        if i >= max_groups:
            break
        g = g.sort_values("theta")
        fig, ax = plt.subplots()
        ax.plot(g["theta"], 1e-6 * g["t"], "o-", label="data")
        w = min(window, len(g) - (len(g) + 1) % 2)
        ax.plot(g["theta"], 1e-6 * scipy.signal.savgol_filter(
            g["t"], w, min(order, w - 1)), "--",
            label=f"Savitzky-Golay({w},{min(order, w - 1)})")
        ax.set_xlabel(r"$\theta$")
        ax.set_ylabel("time [s]")
        ax.legend()
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            fig.savefig(os.path.join(save_dir, f"smoothed_{i}.png"))
            plt.close(fig)
        figs.append(fig)
    return figs


def plot_pred_scatter(target, pred, sigma=None, save_path=None):
    """Prediction vs truth, colored by the uncertainty indicator."""
    fig, ax = plt.subplots()
    sc = ax.scatter(target, pred, c=sigma if sigma is not None else "C0",
                    s=8, cmap="viridis")
    lim = [min(np.min(target), np.min(pred)),
           max(np.max(target), np.max(pred))]
    ax.plot(lim, lim, "k--", lw=1)
    ax.set_xlabel("target")
    ax.set_ylabel("prediction")
    if sigma is not None:
        fig.colorbar(sc, label=r"$\hat\sigma$")
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def plot_perf_histogram(perf_df, save_path=None):
    fig, ax = plt.subplots()
    ax.hist(100 * perf_df["perf"], bins=21, alpha=0.8, label="achieved P")
    ax.hist(100 * perf_df["perf_max"], bins=21, alpha=0.5,
            label="oracle P_MAX")
    ax.set_xlabel("performance gain vs θ=0.5 [%]")
    ax.set_ylabel("# problems")
    ax.legend()
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def plot_view_gallery(views, titles=None, save_path=None, log_scale=True):
    """Pooled-view image gallery (one subplot per matrix image)."""
    n = len(views)
    cols = min(4, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i, v in enumerate(views):
        ax = axes[i // cols][i % cols]
        img = np.log(np.abs(v) + 1) * np.sign(v) if log_scale else v
        ax.imshow(img, cmap="RdBu")
        ax.set_xticks([])
        ax.set_yticks([])
        if titles:
            ax.set_title(titles[i], fontsize=8)
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def plot_feature_maps(maps: dict, sample: int = 0, max_channels: int = 16,
                      save_dir=None):
    """4×4 activation grids per conv layer (cnn_filter_visualization)."""
    figs = []
    for li, (name, act) in enumerate(maps.items()):
        c = min(act.shape[-1], max_channels)
        cols = 4
        rows = -(-c // cols)
        fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows),
                                 squeeze=False)
        for k in range(c):
            ax = axes[k // cols][k % cols]
            ax.imshow(act[sample, :, :, k], cmap="viridis")
            ax.set_xticks([])
            ax.set_yticks([])
        fig.suptitle(name, fontsize=9)
        for j in range(c, rows * cols):
            axes[j // cols][j % cols].axis("off")
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            fig.savefig(os.path.join(save_dir, f"fmap_{li}.png"))
            plt.close(fig)
        figs.append(fig)
    return figs


def plot_hexbin_proxies(proxy_df, save_path=None, gridsize=12):
    """Hexbin joint plots of θ_argmin(t) against the hierarchy-size-proxy
    argmins — the reference's data_analysis.py:16-59 figure: one panel per
    proxy (Σn_k, Σnnz_k, Σ n_k·nnz_k, ρ), with the identity diagonal."""
    proxies = [c for c in ("theta_nsum", "theta_nzsum", "theta_nnz",
                           "theta_rho") if c in proxy_df.columns]
    fig, axes = plt.subplots(1, len(proxies),
                             figsize=(4 * len(proxies), 4), squeeze=False)
    x = proxy_df["theta_t"].to_numpy(dtype=float)
    lim = (min(0.0, x.min()), max(1.0, x.max()))
    for ax, col in zip(axes[0], proxies):
        y = proxy_df[col].to_numpy(dtype=float)
        hb = ax.hexbin(x, y, gridsize=gridsize, extent=lim + lim,
                       cmap="viridis", mincnt=1)
        ax.plot(lim, lim, "r--", lw=1)
        ax.set_xlabel(r"$\theta^* = \arg\min_\theta t$")
        ax.set_ylabel(rf"$\arg\min$ {col.replace('theta_', '')}")
        fig.colorbar(hb, ax=ax)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig


def plot_sigma_bar_elbow(study: dict, save_path=None):
    """σ̄-elbow figure (model_evaluation.py:568-643): the sorted √err
    curve with the detected elbow, and the cumulative fraction of bad
    predictions kept when filtering at each threshold."""
    err = np.asarray(study["err_sorted"], dtype=float)
    frac = np.asarray(study["frac_bad_cum"], dtype=float)
    idx = int(study["elbow_index"])
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4))
    ax1.plot(err, label=r"$\sqrt{\hat\sigma}$ (sorted desc.)")
    ax1.axvline(idx, color="r", ls="--",
                label=rf"elbow → $\bar\sigma$={study['sigma_bar']:.3g}")
    ax1.set_xlabel("problem rank")
    ax1.set_ylabel(r"$\sqrt{\hat\sigma}$")
    ax1.legend()
    ax2.plot(frac)
    ax2.axvline(idx, color="r", ls="--")
    ax2.set_xlabel("problems kept (ranked by uncertainty)")
    ax2.set_ylabel("cumulative fraction with P < 0")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig


def plot_spectrum(spec_df, save_path=None):
    """tc2.1 conditioning-study figure (data_analysis.py:70-157): κ vs h
    (log-log, one line per diffusion exponent, with the slope of the
    fitted power law) and κ vs the marked-point distance from the domain
    center (one line per refinement)."""
    # keep, per problem, the row from the most accurate solver AVAILABLE
    # (the dense verification only runs on ≤2048-dof systems)
    keys = [c for c in ("mesh_ref", "diff", "dist_center")
            if c in spec_df.columns]
    df = spec_df.loc[spec_df.groupby(keys)["solver"].idxmax()]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9.5, 4))
    for d, g in df.groupby("diff"):
        g = g.groupby("h", as_index=False)["kappa"].mean().sort_values("h")
        slope = (np.polyfit(np.log(g["h"]), np.log(g["kappa"]), 1)[0]
                 if len(g) >= 2 else np.nan)
        ax1.loglog(g["h"], g["kappa"], "o-",
                   label=f"diff exp {d:g} (slope {slope:.2f})")
    ax1.set_xlabel("h")
    ax1.set_ylabel(r"$\kappa = \lambda_{max}/\lambda_{min}$")
    ax1.legend(fontsize=7)
    finest = df[df["mesh_ref"] == df["mesh_ref"].max()]
    for d, g in finest.groupby("diff"):
        g = g.groupby("dist_center", as_index=False)["kappa"].mean()
        ax2.semilogy(g["dist_center"], g["kappa"], "s-",
                     label=f"diff exp {d:g}")
    ax2.set_xlabel("marked-point distance from center")
    ax2.set_ylabel(rf"$\kappa$ (ref {int(df['mesh_ref'].max())})")
    ax2.legend(fontsize=7)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def plot_cost_scaling(perf_df, save_path=None):
    """Cost-scaling regression figure (model_evaluation.py:430-565):
    t/ndof against ndof (log-x) per degree, default θ vs ANN-predicted θ*,
    with the fitted log-linear trends."""
    degrees = sorted(perf_df["degree"].unique())
    fig, axes = plt.subplots(1, len(degrees),
                             figsize=(4.5 * len(degrees), 4), squeeze=False)
    for ax, deg in zip(axes[0], degrees):
        g = perf_df[perf_df["degree"] == deg]
        x = g["ndof"].to_numpy(dtype=float)
        order = np.argsort(x)
        for label, col, style in (("default θ=0.5", "t", "o-"),
                                  ("ANN θ*", "t_interp", "s--")):
            if col not in g.columns:
                continue
            y = g[col].to_numpy(dtype=float) / x
            ax.plot(x[order], y[order], style, ms=4, label=label)
            lx = np.log(x)
            if len(g) >= 2 and np.ptp(lx) > 0:
                slope, icept = np.polyfit(lx, y, 1)
                ax.plot(x[order], slope * lx[order] + icept, ":",
                        lw=1, color="k")
        ax.set_xscale("log")
        ax.set_xlabel("ndof")
        ax.set_ylabel("t / ndof [µs]")
        ax.set_title(f"degree {deg}")
        ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig
