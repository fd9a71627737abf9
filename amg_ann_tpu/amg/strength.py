"""Strength of connection (classical, BoomerAMG-compatible semantics).

The strong-threshold θ here is *the* parameter the whole framework revolves
around — the reference sweeps it via
`PreconditionBoomerAMG::AdditionalData.strong_threshold`
(reference: common/amg_solver.h:30, testcase2 main.cpp:447-453) and the ANN
predicts it. Definitions follow hypre's par_strength semantics:

  * measure of connection j for row i:  -a_ij  if a_ii > 0, else +a_ij
  * j is strong  ⟺  measure_ij ≥ θ · max_{k≠i} measure_ik  (and > 0)
  * max_row_sum weakening (AdditionalData.max_row_sum, default 0.9): when
    mrs < 1 and |Σ_j a_ij| > mrs · |a_ii|, row i is treated as having NO
    strong connections (its error is handled by the smoother alone).
"""

from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR


def classical_strength(a: CSR, theta: float, max_row_sum: float = 0.9) -> CSR:
    """Strength graph S: S[i,j] = measure for strong off-diagonal (i,j).

    Returned as CSR with the (positive) strength measures as values; the
    pattern is what coarsening/interpolation consume.
    """
    rows, cols, vals = a.row_expand()
    diag = a.diagonal()
    offd = rows != cols

    sign = np.where(diag > 0, -1.0, 1.0)
    measure = sign[rows] * vals
    measure = np.where(offd, measure, 0.0)

    # per-row max of positive measures
    row_max = np.zeros(a.nrows, dtype=a.data.dtype)
    np.maximum.at(row_max, rows, np.where(measure > 0, measure, 0.0))

    strong = offd & (measure > 0) & (measure >= theta * row_max[rows])

    if max_row_sum < 1.0:
        row_sum = np.zeros(a.nrows, dtype=a.data.dtype)
        np.add.at(row_sum, rows, vals)
        weak_row = np.abs(row_sum) > max_row_sum * np.abs(diag)
        strong &= ~weak_row[rows]

    return CSR.from_coo(
        rows[strong], cols[strong], measure[strong], a.shape,
        sum_duplicates=False,
    )
