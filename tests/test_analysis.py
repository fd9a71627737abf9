"""L7 parity: eval_model, proxy/spectrum tables, feature maps."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import jax

from amg_ann_tpu.ann import ThetaCostModel, create_state
from amg_ann_tpu.pipeline.analysis import (
    feature_maps, spectrum_table, theta_proxy_table,
)


def test_theta_proxy_table():
    rows = []
    for pid in range(2):
        for i, th in enumerate((0.2, 0.4, 0.6)):
            rows.append({
                "pid": pid, "theta": th,
                "t_solve": 10 + (th - 0.4) ** 2, "t_amg_setup": 1.0,
                "nrows": f'"{100 - i},{30}"', "nze": f'"{500 + i * 10},{90}"',
                "rho": 0.5 - 0.1 * i,
            })
    out = theta_proxy_table(pd.DataFrame(rows), ["pid"])
    assert len(out) == 2
    assert np.allclose(out["theta_t"], 0.4)
    assert np.allclose(out["theta_nsum"], 0.6)   # rows shrink with i
    assert np.allclose(out["theta_rho"], 0.6)


def test_spectrum_table():
    df = pd.DataFrame([
        {"mesh_ref": 3, "diff": 2.0, "mpt": '"0,0,0"', "min": 0.1,
         "max": 10.0, "solver": 0},
        {"mesh_ref": 4, "diff": 2.0, "mpt": '"0.5,0.5,0.5"', "min": 0.05,
         "max": 10.0, "solver": 0},
    ])
    out = spectrum_table(df)
    assert np.allclose(out["kappa"], [100.0, 200.0])
    assert np.allclose(out["dist_center"], [0.0, np.sqrt(0.75)])
    assert np.allclose(out["h"], [0.125, 0.0625])


def test_feature_maps():
    m = ThetaCostModel(nparams=2, wide1=4, depth1=2, wide2=6, depth2=1,
                       bottleneck=4, wide3=8, depth3=1, learn_err=False)
    state = create_state(m, jax.random.PRNGKey(0), (16, 16, 3))
    view = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    pvec = np.zeros((2, 2), dtype=np.float32)
    maps = feature_maps(m, state.params, view, pvec)
    assert len(maps) >= 2      # at least the conv outputs
    for k, v in maps.items():
        assert v.shape[0] == 2 and v.ndim == 4


def test_elbow_and_sigma_bar_study():
    from amg_ann_tpu.pipeline.analysis import (
        get_elbow_distance, sigma_bar_study,
    )

    # convex-decay curve: elbow at the bend
    v = np.array([10.0, 4.0, 2.0, 1.5, 1.2, 1.1, 1.0])
    d = get_elbow_distance(v)
    assert np.argmax(d) in (1, 2)

    perf = pd.DataFrame({
        "perf": [0.2, 0.1, -0.3, 0.15, -0.1],
        "perf_max": [0.3, 0.2, 0.1, 0.2, 0.1],
        "tnl_nn_err": [0.01, 0.02, 0.5, 0.015, 0.4],
    })
    out = sigma_bar_study(perf)
    assert out["sigma_bar"] > 0
    assert 0 <= out["elbow_index"] < len(perf)
    assert out["frac_bad_cum"][0] == pytest.approx(2 / 5)


def test_cost_scaling_table():
    from amg_ann_tpu.pipeline.analysis import cost_scaling_table

    rng = np.random.default_rng(0)
    rows = []
    for deg in (1, 2):
        for ndof in (1000, 8000, 64000):
            rows.append({"degree": deg, "ndof": ndof,
                         "t": 1e-3 * ndof * (1 + 0.1 * np.log(ndof)),
                         "t_interp": 0.9e-3 * ndof})
    out = cost_scaling_table(pd.DataFrame(rows))
    assert set(out["curve"]) == {"default", "predicted"}
    assert len(out) == 4
    pred = out[(out.curve == "predicted")]
    assert np.allclose(pred["slope"], 0.0, atol=1e-12)


def test_figure_parity_plots(tmp_path):
    """Hexbin / σ̄-elbow / cost-scaling figures (reference
    data_analysis.py:16-59, model_evaluation.py:430-643)."""
    from amg_ann_tpu.pipeline.analysis import (get_elbow_distance,
                                               sigma_bar_study)
    from amg_ann_tpu.pipeline.plots import (plot_cost_scaling,
                                            plot_hexbin_proxies,
                                            plot_sigma_bar_elbow)

    rng = np.random.default_rng(0)
    n = 40
    proxy_df = pd.DataFrame({
        "theta_t": rng.uniform(0, 1, n),
        "theta_nsum": rng.uniform(0, 1, n),
        "theta_nzsum": rng.uniform(0, 1, n),
        "theta_nnz": rng.uniform(0, 1, n),
        "theta_rho": rng.uniform(0, 1, n),
    })
    f1 = plot_hexbin_proxies(proxy_df, save_path=tmp_path / "hex.png")
    assert (tmp_path / "hex.png").exists()

    perf_df = pd.DataFrame({
        "nn_err": rng.uniform(0, 0.5, n) ** 2,
        "perf": rng.uniform(-0.2, 0.5, n),
        "degree": rng.choice([1, 2], n),
        "ndof": rng.choice([4096, 32768, 262144], n).astype(float),
        "t": rng.uniform(1e5, 1e6, n),
        "t_interp": rng.uniform(1e5, 1e6, n),
    })
    study = sigma_bar_study(perf_df, err_col="nn_err")
    f2 = plot_sigma_bar_elbow(study, save_path=tmp_path / "elbow.png")
    f3 = plot_cost_scaling(perf_df, save_path=tmp_path / "scaling.png")
    assert (tmp_path / "elbow.png").exists()
    assert (tmp_path / "scaling.png").exists()
    import matplotlib.pyplot as plt

    plt.close("all")


def test_sigma_bar_calibrated():
    """Calibrated σ̄ keeps profitable predictions when σ̂ is informative
    (synthetic: low σ̂ ⇒ good, high σ̂ ⇒ coin-flip)."""
    from amg_ann_tpu.pipeline.analysis import sigma_bar_calibrated

    rng = np.random.default_rng(0)
    n = 400
    err = np.sort(rng.random(n))
    perf = np.where(np.arange(n) < n // 2,
                    np.abs(rng.normal(0.15, 0.05, n)),          # informative
                    rng.normal(0.0, 0.2, n))                    # coin-flip
    df = pd.DataFrame({"tnl_nn_err": err, "perf": perf})
    cal = sigma_bar_calibrated(df, min_frac_good=0.9)
    assert cal["met"]
    kept = df[df["tnl_nn_err"] < cal["sigma_bar"]]
    assert (kept["perf"] >= 0).mean() >= 0.9
    # it must keep a materially profitable set, not a degenerate sliver
    assert cal["n_kept"] >= n // 4
    assert cal["overall_mean_gain"] > 0.05


def test_sigma_bar_calibrated_weak_signal():
    """With junk σ̂ the selector reports met=False instead of shipping a
    degenerate threshold."""
    from amg_ann_tpu.pipeline.analysis import sigma_bar_calibrated

    rng = np.random.default_rng(1)
    df = pd.DataFrame({"tnl_nn_err": rng.random(200),
                       "perf": rng.normal(-0.2, 0.1, 200)})
    cal = sigma_bar_calibrated(df, min_frac_good=0.85)
    assert not cal["met"]
