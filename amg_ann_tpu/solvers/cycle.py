"""V-cycle application over a DeviceHierarchy (jit-traceable, unrolled).

The level loop is a Python recursion over a static tuple of levels, so jit
traces one fused computation per hierarchy shape — no dynamic control flow,
every SpMV a static-shape gather/contract XLA fuses aggressively.

This is the device-side replacement for hypre's V-cycle inside PETSc's
`cg.solve` (reference: common/amg_solver.h:53-56).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..sparse.ell import spmv
from .smoothers import apply_smoother


def vcycle(h, b):
    """One V(ν1,ν2)-cycle applied to rhs b with zero initial guess."""
    return _cycle(h, 0, b)


def _cycle(h, l, b):
    params = h.params
    lev = h.levels[l]
    if l == len(h.levels) - 1:
        # coarsest: dense solve via precomputed inverse — a small matmul
        # that lands on the MXU.
        return h.coarse_inv @ b

    # Shape contract: vectors at level l have length lev.a.data.shape[0]
    # (nrows, possibly row-padded for sharding); restriction output length
    # equals the next level's padded row count because r/p/a share the same
    # padding rule. Padded rows are all-zero, so they stay zero throughout.
    x = jnp.zeros_like(b)
    for _ in range(params.n_pre_smooth):
        x = apply_smoother(lev, x, b, params)

    r = b - spmv(lev.a, x)
    bc = spmv(lev.r, r)
    xc = _cycle(h, l + 1, bc)
    x = x + spmv(lev.p, xc)

    for _ in range(params.n_post_smooth):
        x = apply_smoother(lev, x, b, params)
    return x
