"""ANN-in-the-loop deployment API with the shipped pretrained model."""

import numpy as np
import pytest

from amg_ann_tpu.ann import load_model
from amg_ann_tpu.fem.structured import StructuredDiffusion
from amg_ann_tpu.solvers.ann_solver import (
    ann_amg_solve, predict_theta_for_matrix,
)

MODEL_DIR = "/root/repo/data/models/tc2-demo"


@pytest.fixture(scope="module")
def shipped():
    model, params, spec = load_model(MODEL_DIR)
    return model, params, spec


def test_shipped_model_loads(shipped):
    model, params, spec = shipped
    assert spec == {"view_size": 24, "channels": 4}
    assert model.nparams == 3


def test_predict_theta_for_matrix(shipped):
    model, params, spec = shipped
    rng = np.random.default_rng(0)
    p = StructuredDiffusion(pattern_size=2, refinements=3, mode=3,
                            epsv=rng.uniform(0, 5, 8))
    a, b, x0 = p.build()
    theta, cost, sigma = predict_theta_for_matrix(
        a, model, params, view_size=spec["view_size"],
        scalar_inputs={"log2ndof": float(np.log2(a.nrows)), "theta": 0.5,
                       "mode": 3.0})
    assert 0.05 - 0.1 <= theta <= 0.95 + 0.1
    assert sigma >= 0.0


def test_ann_amg_solve_end_to_end(shipped):
    """Full deployment: matrix in, ANN-chosen θ, converged solve out."""
    model, params, spec = shipped
    rng = np.random.default_rng(1)
    p = StructuredDiffusion(pattern_size=2, refinements=3, mode=2,
                            epsv=rng.uniform(0, 4, 4))
    a, b, x0 = p.build()
    res, theta, sigma = ann_amg_solve(
        a, b, model, params, view_size=spec["view_size"],
        scalar_inputs={"log2ndof": float(np.log2(a.nrows)), "theta": 0.5,
                       "mode": 2.0},
        x0=x0, rtol=1e-8, tol=0.0)
    assert res.converged, res.niters
    assert 0.05 <= theta <= 0.95
    assert res.hierarchy.params.strong_threshold == theta


def test_stencil_fast_path_matches_host(shipped):
    """Deployment fast path (device stencil view + device pred_theta)
    must agree with the host oracle path on the SAME matrix."""
    model, params, spec = shipped
    rng = np.random.default_rng(2)
    p = StructuredDiffusion(pattern_size=2, refinements=3, mode=3,
                            epsv=rng.uniform(0, 5, 8))
    a, b, x0 = p.build()
    gs = (p.n_nodes_1d,) * 3
    from amg_ann_tpu.amg.boxmg import csr_to_stencil

    s = csr_to_stencil(a, gs)
    scal = {"log2ndof": float(np.log2(a.nrows)), "theta": 0.5,
            "mode": 3.0}
    th_host, cost_host, sig_host = predict_theta_for_matrix(
        a, model, params, view_size=spec["view_size"],
        scalar_inputs=scal)
    th_dev, cost_dev, sig_dev = predict_theta_for_matrix(
        None, model, params, view_size=spec["view_size"],
        scalar_inputs=scal, stencil=s, grid_shape=gs)
    np.testing.assert_allclose(th_dev, th_host, atol=1e-5)
    np.testing.assert_allclose(cost_dev, cost_host, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sig_dev, sig_host, rtol=1e-4, atol=1e-6)
