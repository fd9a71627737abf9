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
