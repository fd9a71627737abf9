"""Operator-apply dispatch: one matvec entry point for every device
operator representation (ELL gather, DIA banded jnp, DIA Pallas kernel).

Backend selection happens at trace time: the Pallas TPU kernel is used for
DIA operands when tracing for TPU; elsewhere the portable jnp shift path
runs (identical math).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..sparse.dia import DIA, dia_spmv, dia_spmv_fast
from ..sparse.ell import DenseOp, ELL, dense_matvec, spmv as ell_spmv


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# Pallas floor: levels with n ≥ this ride the fused kernels. The 64³
# solve is op-LATENCY bound (CLAUDE.md round-2): a coarse-level Chebyshev
# sweep on the jnp roll path is ~60 small XLA ops, the same sweep fused is
# ONE launch, so the kernels pay on every level big enough for legal
# (8, 128) Mosaic tiles — n ≥ 2048 keeps R ≥ 16 rows. (The 512-dof level
# stays on the jnp path: its R = 8 would force sub-tile blocks.) Each
# distinct (K, R) shape still costs one remote-tunnel compile (minutes,
# then .jax_cache-cached) — keep level shapes canonical (sparse/dia.
# padded_rows) so a whole sweep reuses a handful of shapes.
# AMG_PALLAS_MIN_ROWS overrides without a code edit (fallback lever if a
# small-shape kernel ever fails Mosaic compile on new hardware).
PALLAS_MIN_ROWS = int(os.environ.get("AMG_PALLAS_MIN_ROWS", "2048"))


def _use_pallas(op) -> bool:
    # Pallas path: f32 only — XLA's x64-rewrite pass cannot process
    # f64 pallas custom-calls (and f64 on TPU is emulated anyway)
    return (isinstance(op, DIA) and _on_tpu() and op.cols == 128
            and op.n >= PALLAS_MIN_ROWS and op.data.dtype == jnp.float32)


def op_matvec(op, x):
    """y = op @ x for ELL, WELL, DIA, or shard-local HaloDIA operands."""
    if isinstance(op, DIA):
        if _use_pallas(op):
            return dia_spmv_fast(op, x)
        return dia_spmv(op, x)
    if isinstance(op, ELL):
        return ell_spmv(op, x)
    from ..sparse.well import WELL, spmv as well_spmv

    if isinstance(op, WELL):
        return well_spmv(op, x)
    if isinstance(op, DenseOp):
        return dense_matvec(op, x)
    from ..dist.halo import HaloDIA

    if isinstance(op, HaloDIA):
        return op.matvec(x)
    raise TypeError(f"unknown operator type {type(op)!r}")


def op_padded_rows(op):
    """Device vector length an operator's matvec produces/expects on the
    row side, or None when vectors live at the true row count (DIA)."""
    from ..sparse.well import WELL

    if isinstance(op, ELL):
        return op.data.shape[0]
    if isinstance(op, WELL):
        return op.padded_rows
    if isinstance(op, DenseOp):
        return op.m.shape[0]
    return None


def op_cheb_sweep(op, x, r, d, s, coefs):
    """coefs.shape[0] residual-carrying smoother steps (see
    op_smooth_step) applied back-to-back. On TPU DIA operands the WHOLE
    sweep is one Pallas launch (A bands / r / s stream from HBM once);
    elsewhere it's the per-step loop."""
    if _use_pallas(op):
        from ..sparse.dia import dia_cheb_sweep_fast

        return dia_cheb_sweep_fast(op, x, r, d, s, coefs)
    for j in range(int(coefs.shape[0])):
        x, r, d = op_smooth_step(op, x, r, d, s, coefs[j, 0], coefs[j, 1])
    return x, r, d


def _use_well_fused(op) -> bool:
    from ..sparse.well import WELL, fits_vmem_fused

    return (isinstance(op, WELL) and _on_tpu()
            and op.data.dtype == jnp.float32 and fits_vmem_fused(op)
            and os.environ.get("AMG_WELL_FUSED", "1") == "1")


def op_smooth_apply(op, x, b, s, coefs, x_zero: bool, want_res: bool):
    """One COMPLETE smoother application (solvers/smoothers.smooth_rx
    semantics) from (x, b): computes the initial residual itself
    (r = b − A x, elided when x_zero), runs the coefs-row recurrence, and
    returns (x', r' or None). On TPU DIA operands the WHOLE application —
    including the initial-residual matvec that used to be a separate
    launch — is ONE fused Pallas kernel; WELL operands that fit VMEM get
    the same single-launch treatment (sparse/well.smooth_apply, r5)."""
    if _use_pallas(op):
        from ..sparse.dia import dia_smooth_apply_fast

        return dia_smooth_apply_fast(op, x, b, s, coefs, x_zero, want_res)
    if _use_well_fused(op):
        from ..sparse.well import smooth_apply as well_smooth_apply

        return well_smooth_apply(op, x, b, s, coefs, x_zero, want_res)
    r = b if x_zero else b - op_matvec(op, x)
    d = coefs[0, 0] * (s * r)
    for j in range(1, int(coefs.shape[0])):
        t = op_matvec(op, d)
        x = x + d
        r = r - t
        d = coefs[j, 0] * d + coefs[j, 1] * (s * r)
    if want_res:
        return x + d, r - op_matvec(op, d)
    return x + d, None


def op_smooth_step(op, x, r, d, s, c_a, c_b):
    """One residual-carrying smoother step (solvers/smoothers.py):

        t = A d;  x' = x + d;  r' = r − t;  d' = c_a·d + c_b·(s ⊙ r')

    On TPU DIA operands this is ONE fused Pallas kernel (matvec + all
    elementwise updates, one pass over HBM); elsewhere XLA fuses the
    elementwise tail around the matvec.
    """
    if _use_pallas(op):
        from ..sparse.dia import dia_smooth_step_fast

        return dia_smooth_step_fast(op, x, r, d, s, c_a, c_b)
    t = op_matvec(op, d)
    x2 = x + d
    r2 = r - t
    d2 = c_a * d + c_b * (s * r2)
    return x2, r2, d2
