"""Dirichlet boundary-condition application on assembled CSR systems.

Behavioral analog of deal.II `MatrixTools::apply_boundary_values`
(called at testcase2 main.cpp:317 with eliminate_columns=false):

  * the constrained row is zeroed except its original diagonal entry d_k;
  * rhs_k = d_k · g_k (so x_k = g_k exactly);
  * eliminate_columns=True additionally moves column contributions to the
    rhs (rhs_i −= A_ik·g_k) and zeroes the column — keeping the operator
    SYMMETRIC, which is what CG+AMG actually wants. The reference passes
    false (leaving the matrix mildly nonsymmetric at the boundary); we
    default to the symmetric variant and expose the flag for parity.

Zeroed entries stay STORED (explicit zeros), matching PETSc semantics —
this matters for the pooling operator's `count` channel.
"""

from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR


def apply_dirichlet(a: CSR, rhs: np.ndarray, bc_idx: np.ndarray,
                    bc_vals: np.ndarray, eliminate_columns: bool = True):
    """Return (A', rhs', x0) with boundary conditions imposed.

    x0 is the reference's `m_zero_solution` (testcase2 main.cpp:319):
    zeros with g on the boundary — the initial guess for every solve.
    """
    n = a.nrows
    is_bc = np.zeros(n, dtype=bool)
    is_bc[bc_idx] = True
    g = np.zeros(n, dtype=a.data.dtype)
    g[bc_idx] = bc_vals

    rows, cols, vals = a.row_expand()
    diag = a.diagonal()
    # deal.II uses the first nonzero diagonal as a substitute scale when a
    # constrained diagonal is zero; our assemblies always have d_k != 0.
    d_sub = diag[bc_idx]
    if np.any(d_sub == 0):
        nonzero = diag[diag != 0]
        d_sub = np.where(d_sub == 0, nonzero[0] if nonzero.size else 1.0,
                         d_sub)

    rhs = np.array(rhs, dtype=a.data.dtype, copy=True)
    if eliminate_columns:
        # move column contributions of constrained dofs to the rhs
        contrib = np.where(is_bc[cols] & ~is_bc[rows], vals * g[cols], 0.0)
        np.subtract.at(rhs, rows, contrib)

    on_diag = rows == cols
    keep = np.where(
        is_bc[rows] | (eliminate_columns & is_bc[cols]),
        on_diag & is_bc[rows],  # only the diagonal survives in bc rows
        True,
    )
    new_vals = np.where(keep, vals, 0.0)

    rhs[bc_idx] = diag[bc_idx] * bc_vals
    rhs[bc_idx] = np.where(diag[bc_idx] != 0, rhs[bc_idx], d_sub * bc_vals)

    x0 = np.zeros(n, dtype=a.data.dtype)
    x0[bc_idx] = bc_vals
    return CSR(a.indptr, a.indices, new_vals, a.shape), rhs, x0
