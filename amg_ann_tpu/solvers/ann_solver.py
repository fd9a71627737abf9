"""ANN-in-the-loop solve: predict θ from the matrix, then AMG-PCG.

The deployment mode the reference only simulates offline
(model_evaluation.pred_theta over recorded sweeps): here the θ-predictor
runs *inside* the setup path (SURVEY.md §7.6) —

    setup(A) = classical_setup(A, θ = argmin_θ ANN(view(A), params(θ)))

view pooling runs on device (jitted), the θ grid search is one batched
ANN forward, and the chosen θ drives the classical (θ-sensitive)
hierarchy. BASELINE config 2 ("ANN-predicted strong threshold") as an API.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..amg.hierarchy import AMGParams
from ..ann.normalize import stack_channels
from ..pipeline.evaluate import pred_theta
from ..sparse.csr import CSR
from ..view.pooling import View, make_view
from .amg_solver import SolveResult, amg_solve
from .refine import IRResult, ir_solve


def predict_theta_for_matrix(a: CSR, model, params, *, view_size: int,
                             view_type: str = "sum+max+c",
                             norm_mode: str = "pure_log",
                             scalar_inputs: dict | None = None,
                             search_config: dict | None = None,
                             stencil=None, grid_shape=None):
    """(θ*, predicted cost, σ̂) for a matrix via the trained θ-cost model.

    scalar_inputs: the model's non-θ inputs; defaults to the shipped
    configuration {log2ndof, theta, degree-or-mode...} — pass exactly what
    the model was trained with, θ entry included (its value is swept).

    stencil + grid_shape: deployment fast path — pool the view on device
    from the structured path's resident (27, n) stencil instead of
    traversing the host CSR (tens of seconds at 129³; see
    view/pooling.make_view_stencil). `a` may then be None.
    """
    if stencil is not None:
        # deployment fast path: view, normalization and the θ search all
        # stay on device — one 3-scalar fetch at the very end
        from ..ann.normalize import stack_channels_device
        from ..view.pooling import make_view_stencil

        assert grid_shape is not None, "stencil path needs grid_shape"
        view = make_view_stencil(stencil, grid_shape, view_size)
        img = stack_channels_device(view, view_type, norm_mode)
    else:
        view, _ = make_view(a, view_size)
        img = stack_channels(view.sum, view.max_pp, view.max_np,
                             view.count, view_type,
                             norm_mode).astype(np.float32)
    if scalar_inputs is None:
        ndof = (a.nrows if a is not None
                else int(np.prod(grid_shape)))
        scalar_inputs = {"log2ndof": float(np.log2(max(ndof, 2))),
                         "theta": 0.5, "degree": 1.0}
    if stencil is not None:
        # deployment: whole grid search in one jit, 3 scalars back
        from ..pipeline.evaluate import pred_theta_device

        return pred_theta_device(model, params, img, scalar_inputs,
                                 search_config)
    return pred_theta(model, params, img, scalar_inputs, search_config)


def ann_amg_solve(a: CSR, b, model, params, *, view_size: int,
                  view_type: str = "sum+max+c", norm_mode: str = "pure_log",
                  scalar_inputs: dict | None = None,
                  search_config: dict | None = None,
                  amg_params: AMGParams | None = None, clip=(0.05, 0.95),
                  use_ir: bool = False, **solve_kw):
    """Solve A x = b with the ANN-chosen strong threshold.

    Returns (result, theta_star, sigma_hat); result is a SolveResult (or
    IRResult with use_ir=True). θ* is clipped into `clip` — the sweep range
    the model was trained on.
    """
    theta, _, sigma = predict_theta_for_matrix(
        a, model, params, view_size=view_size, view_type=view_type,
        norm_mode=norm_mode, scalar_inputs=scalar_inputs,
        search_config=search_config)
    theta = float(np.clip(theta, *clip))
    base = amg_params or AMGParams()
    base = dataclasses.replace(base, strong_threshold=theta)
    solver = ir_solve if use_ir else amg_solve
    result = solver(a, b, base, **solve_kw)
    return result, theta, sigma
