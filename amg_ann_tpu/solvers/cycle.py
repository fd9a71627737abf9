"""V-cycle application over a device hierarchy (jit-traceable, unrolled).

The level loop is a Python recursion over a static tuple of levels, so jit
traces one fused computation per hierarchy shape — no dynamic control
flow. Works over both hierarchy kinds:

  * classical (DeviceLevel): explicit ELL P/R matrices (gather SpMV);
  * structured (StructuredLevel): DIA operators + functional trilinear
    prolongate / full-weighting restrict — the gather-free TPU fast path.

This is the device-side replacement for hypre's V-cycle inside PETSc's
`cg.solve` (reference: common/amg_solver.h:53-56).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..amg.structured_mg import BlockStructuredLevel, StructuredLevel
from ..amg.transfer import (interleave_flat, prolongate, prolongate_bw,
                            prolongate_w, restrict, restrict_bw, restrict_w,
                            subsample_flat)
from ..sparse.ell import spmv
from .ops import _use_pallas, op_matvec
from .smoothers import smooth_rx

# DIA-form transfer dispatch: "auto" = one-Pallas-launch transfers where
# the level carries them AND the kernel pays (TPU, big level — the same
# _use_pallas gate as the smoothers); "always"/"never" pin the choice
# (tests exercise the jnp DIA path on CPU with "always").
TRANSFER_DIA_MODE = "auto"

# Fused coarse-tail dispatch (sparse/pallas_cycle.py): "auto" = engage on
# TPU when the hierarchy carries a plan; "never" disables; "interpret"
# runs the kernel in Pallas interpret mode (CPU tests).
FUSED_TAIL_MODE = "auto"


def _use_fused_tail(h, l) -> bool:
    ft = getattr(h, "fused_tail", None)
    if ft is None or l != ft.l0 or FUSED_TAIL_MODE == "never":
        return False
    if FUSED_TAIL_MODE == "interpret":
        return True
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _dia_transfers(lev) -> bool:
    if lev.p_dia is None:
        return False
    if lev.p_w is None:
        return True   # p_w dropped to save HBM — DIA is the only path
    if TRANSFER_DIA_MODE == "never":
        return False
    return TRANSFER_DIA_MODE == "always" or _use_pallas(lev.p_dia)


def vcycle(h, b):
    """One V(ν1,ν2)-cycle applied to rhs b with zero initial guess."""
    return _cycle(h, 0, b)


def _cycle(h, l, b):
    params = h.params
    lev = h.levels[l]
    if _use_fused_tail(h, l) and b.dtype == jnp.float32:
        from ..sparse.pallas_cycle import tail_cycle

        return tail_cycle(h.fused_tail, b,
                          interpret=(FUSED_TAIL_MODE == "interpret"))
    if l == len(h.levels) - 1:
        # coarsest: dense solve via precomputed inverse — a small matmul
        # that lands on the MXU.
        return h.coarse_inv @ b

    # Shape contract (classical mode): vectors at level l have length
    # lev.a.data.shape[0] (possibly row-padded for sharding); padding rows
    # are all-zero and stay zero throughout.
    # Residual-carrying pre-smoothing: x starts at 0 so r = b (no A·0
    # product), and the smoother's final recurrence residual IS b − A x —
    # the restriction input comes for free instead of via an extra matvec.
    x = jnp.zeros_like(b)
    r = b
    for i in range(params.n_pre_smooth):
        x, r = smooth_rx(lev, x, b, params, r=r, want_residual=True,
                         x_is_zero=(i == 0))

    structured = isinstance(lev, StructuredLevel)
    block = isinstance(lev, BlockStructuredLevel)
    weighted = (structured or block) and lev.p_w is not None
    if block:
        assert weighted, "block levels always carry per-component weights"
        bc = restrict_bw(r, lev.p_w, lev.shape, lev.strides)
    elif structured and _dia_transfers(lev):
        # DIA transfers carry the weights themselves — big levels may
        # drop the (27, n) p_w array entirely (256³: 1.8 GB of HBM)
        bc = subsample_flat(op_matvec(lev.r_dia, r), lev.shape, lev.strides)
    elif weighted:
        bc = restrict_w(r, lev.p_w, lev.shape, lev.strides)
    elif structured:
        bc = restrict(r, lev.shape)
    else:
        bc = op_matvec(lev.r, r)
    # γ-cycle: approximately solve A_c e = bc with γ recursive cycles
    # (γ=1 → V-cycle, γ=2 → W-cycle)
    gamma = 1 if params.cycle_type == "V" else 2
    xc = _cycle(h, l + 1, bc)
    for _ in range(gamma - 1):
        rc = bc - op_matvec(h.levels[l + 1].a, xc)
        xc = xc + _cycle(h, l + 1, rc)
    if block:
        x = x + prolongate_bw(xc, lev.p_w, lev.shape, lev.strides)
    elif structured and _dia_transfers(lev):
        x = x + op_matvec(lev.p_dia,
                          interleave_flat(xc, lev.shape, lev.strides))
    elif weighted:
        x = x + prolongate_w(xc, lev.p_w, lev.shape, lev.strides)
    elif structured:
        x = x + prolongate(xc, lev.shape)
    else:
        x = x + op_matvec(lev.p, xc)

    for _ in range(params.n_post_smooth):
        x, _ = smooth_rx(lev, x, b, params)
    return x
