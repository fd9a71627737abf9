"""Pallas TPU kernel for DIA (banded) SpMV.

y = Σ_k d_k ⊙ shift(x, o_k) with x laid out (R, 128): a global shift by
o decomposes into a whole-row shift r = o // 128 (pure VMEM addressing)
and a lane shift s = o % 128 (one lane-rotate/concat per offset). The
kernel tiles rows into blocks; each program DMAs its x block plus halo
rows from HBM into VMEM once and accumulates all K taps from VMEM —
~4·(K+2) bytes of HBM traffic per element instead of XLA's per-tap
gather (measured ~0.11 Gnnz/s on v5e; this kernel targets tens of
Gnnz/s).

Caller contract: x is pre-padded with H halo rows of zeros on both ends
(H = max(|o_k| // 128) + 1); boundary wrap values are annihilated by the
zero coefficients DIA carries at rows where an offset walks off the
matrix, so zero padding is exact.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Double-buffered pipeline for the manual x-window DMA (overlap the next
# grid step's HBM fetch with this step's compute) + shared lane-shift
# precomputation (one shifted window per DISTINCT lane shift instead of
# two slices + a concat per tap — a 27-offset stencil has only ~3
# distinct lane shifts). AMG_PALLAS_DB=0 falls back to the serial
# single-buffer kernel (no-code-edit lever if Mosaic rejects the
# double-buffer pattern on new hardware).
PIPELINE_DB = os.environ.get("AMG_PALLAS_DB", "1") != "0"


def _decompose(offsets):
    return [divmod(int(o), LANES) for o in offsets]


def _lane_shifts(offsets):
    """Distinct nonzero lane shifts, in tap order of first appearance."""
    out = []
    for _, s in _decompose(offsets):
        if s and s not in out:
            out.append(s)
    return out


def halo_rows(offsets) -> int:
    rs = [abs(r) + (1 if s else 0) for r, s in _decompose(offsets)]
    return max(rs) if rs else 1


# ---- fused-window vmem accounting -------------------------------------
# Each fused kernel (smooth_step / cheb_sweep / smooth_apply) holds
# (k + n_vec) scoped window copies of win = B + 4·big_h rows plus
# Mosaic's DOUBLE-BUFFERED BlockSpec operand/output blocks — the
# k-diagonal coefficient block alone costs 2·k·B, which the window term
# k·(B + 4·big_h) does not dominate when big_h is small relative to B
# (observed: tc3 block operator k=87, declared 19.89M vs 21.20M actual,
# bench/tpu_chain_tc3.log). Mosaic enforces the per-kernel
# vmem_limit_bytes we declare, so the declared limit must DOMINATE true
# usage: 22.87M actual vs ~19.0M estimated at 129³/k=27/B=128
# (bench/tpu_chain_r3.log — stack temporaries add ~20%), hence the
# explicit 2·k·B term in the need functions plus a 1.5× margin. The
# hard cap stays well under v5e's 128 MiB VMEM so XLA retains working
# space.
_VMEM_HARD_CAP = 64 * 1024 * 1024
_NEED_CAP = 40 * 1024 * 1024       # 1.5·40M + 4M ≤ _VMEM_HARD_CAP


def _vmem_limit(need: int) -> int:
    return min(int(need * 1.5) + 4 * 1024 * 1024, _VMEM_HARD_CAP)


def _pick_block_rows(r, big_h, need_fn, target_bytes, k):
    """Largest power-of-2 divisor of r with (a) clamp window B + 2·big_h
    ≤ R, (b) need_fn(B) ≤ the scoped-vmem cap, starting from an A-band
    VMEM target (big blocks amortize per-program DMA + dispatch). None =
    infeasible at every block size — callers must fall back."""
    target = max(8, min(r, target_bytes // (max(k, 3) * LANES * 4)))
    b = 1
    while (b * 2 <= target) and (r % (b * 2) == 0):
        b *= 2
    while b > 1 and (b + 2 * big_h > r or need_fn(b) > _NEED_CAP):
        b //= 2
    if b + 2 * big_h > r or need_fn(b) > _NEED_CAP:
        return None
    return b


def _apply_need(k, n_vec, n_out, b, big_h):
    return ((k + n_vec) * (b + 4 * big_h)
            + 2 * (k + n_out) * b) * LANES * 4


def smooth_apply_block_rows(k, r, offsets, n_apps, x_zero, want_res):
    """Block choice for dia_smooth_apply_pallas; None = infeasible
    (window larger than R, or scoped vmem over budget at every B) —
    dia.dia_smooth_apply_fast falls back to per-step kernels."""
    big_h = n_apps * halo_rows(offsets)
    n_vec = 3 if x_zero else 4
    n_out = 2 if want_res else 1
    return _pick_block_rows(
        r, big_h, lambda b: _apply_need(k, n_vec, n_out, b, big_h),
        3 * 1024 * 1024, k)


def _cheb_need(k, b, big_h):
    return ((k + 3) * (b + 4 * big_h) + (2 * k + 8) * b) * LANES * 4


def cheb_sweep_block_rows(k, r, offsets, steps):
    """Block choice for dia_cheb_sweep_pallas; None = infeasible."""
    big_h = steps * halo_rows(offsets)
    return _pick_block_rows(r, big_h,
                            lambda b: _cheb_need(k, b, big_h),
                            3 * 1024 * 1024, k)


def _step_need(k, n_shift, b, h):
    return ((2 + max(n_shift, 1)) * (b + 4 * h)
            + 2 * (k + 6) * b) * LANES * 4


def smooth_step_block_rows(k, r, offsets):
    """Block choice for dia_smooth_step_pallas; None = infeasible."""
    h = halo_rows(offsets)
    ns = len(_lane_shifts(offsets))
    return _pick_block_rows(r, h, lambda b: _step_need(k, ns, b, h),
                            4 * 1024 * 1024, k)


def _dia_kernel(offsets, block_rows, halo, x_hbm, d_ref, o_ref, sem):
    i = pl.program_id(0)

    def body(xv):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * block_rows, block_rows + 2 * halo)],
            xv, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((block_rows, LANES), dtype=o_ref.dtype)
        for k, (r, s) in enumerate(_decompose(offsets)):
            base = halo + r
            if s == 0:
                shifted = xv[pl.ds(base, block_rows), :]
            else:
                hi = xv[pl.ds(base, block_rows), pl.ds(s, LANES - s)]
                lo = xv[pl.ds(base + 1, block_rows), pl.ds(0, s)]
                shifted = jnp.concatenate([hi, lo], axis=1)
            acc = acc + d_ref[k] * shifted
        o_ref[:, :] = acc

    pl.run_scoped(
        body,
        pltpu.VMEM((block_rows + 2 * halo, LANES), x_hbm.dtype),
    )


def _dia_kernel_nopad(offsets, block_rows, halo, nrows, x_hbm, d_ref, o_ref,
                      sem):
    """Variant taking UNPADDED x (R, 128) — removes the host-side halo-pad
    copy between chained SpMVs. The DMA window [start-halo, start+B+halo)
    is clamped into [0, R]; the data lands at a mid-window offset so the
    intended slot of every in-matrix row stays correct:

        slot(g) = halo + g − clamped,   base_k = 2·halo + r_k + (start−clamped)

    Rows whose tap walks off the matrix land in the zeroed window flanks
    (coefficients there are zero anyway; flanks are zeroed so stray NaN
    bit-patterns in uninitialized VMEM cannot poison 0·x)."""
    i = pl.program_id(0)
    copy = block_rows + 2 * halo
    win = block_rows + 4 * halo
    # all-i32 index arithmetic: mixing weak python ints here makes the
    # Mosaic x64 convert helper recurse (observed RecursionError)
    start = i * jnp.int32(block_rows) - jnp.int32(halo)
    clamped = jnp.minimum(jnp.maximum(start, jnp.int32(0)),
                          jnp.int32(nrows - copy))
    delta = start - clamped          # in [-halo, halo]

    def body(xv):
        xv[pl.ds(0, halo), :] = jnp.zeros((halo, LANES), dtype=x_hbm.dtype)
        xv[pl.ds(copy + halo, halo), :] = jnp.zeros((halo, LANES),
                                                    dtype=x_hbm.dtype)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(clamped, copy)],
            xv.at[pl.ds(halo, copy)], sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((block_rows, LANES), dtype=o_ref.dtype)
        for k, (r, s) in enumerate(_decompose(offsets)):
            base = 2 * halo + r + delta
            if s == 0:
                shifted = xv[pl.ds(base, block_rows), :]
            else:
                hi = xv[pl.ds(base, block_rows), pl.ds(s, LANES - s)]
                lo = xv[pl.ds(base + 1, block_rows), pl.ds(0, s)]
                shifted = jnp.concatenate([hi, lo], axis=1)
            acc = acc + d_ref[k] * shifted
        o_ref[:, :] = acc

    pl.run_scoped(
        body,
        pltpu.VMEM((win, LANES), x_hbm.dtype),
    )


def _dia_kernel_nopad_db(offsets, block_rows, halo, nrows, grid, x_hbm,
                         d_ref, o_ref, xv, zv, sem):
    """Pipelined variant of _dia_kernel_nopad (same clamped-window
    contract):

    * xv is a 2-slot window buffer; step i starts step i+1's HBM fetch
      before computing, so the x DMA rides under the compute (the A-band
      BlockSpec blocks are already pipelined by Mosaic — this removes
      the one serial start/wait wall per grid step).
    * zv holds one lane-shifted copy of the window per DISTINCT nonzero
      lane shift, built once per step; each tap then reduces to a
      dynamic row-slice + FMA instead of two slices + a concat.
    """
    i = pl.program_id(0)
    copy = block_rows + 2 * halo
    win = block_rows + 4 * halo
    shifts = _lane_shifts(offsets)

    def clamped_of(j):
        start = j * jnp.int32(block_rows) - jnp.int32(halo)
        return jnp.minimum(jnp.maximum(start, jnp.int32(0)),
                           jnp.int32(nrows - copy))

    def dma(j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(clamped_of(j), copy)],
            xv.at[slot, pl.ds(halo, copy)], sem.at[slot])

    @pl.when(i == 0)
    def _():
        # zero both slots' flanks once — the DMAs never touch them
        xv[:, pl.ds(0, halo), :] = jnp.zeros((2, halo, LANES),
                                             dtype=x_hbm.dtype)
        xv[:, pl.ds(copy + halo, halo), :] = jnp.zeros(
            (2, halo, LANES), dtype=x_hbm.dtype)
        dma(0, jnp.int32(0)).start()

    @pl.when(i + 1 < grid)
    def _():
        dma(i + 1, jax.lax.rem(i + jnp.int32(1), jnp.int32(2))).start()

    slot = jax.lax.rem(i, jnp.int32(2))
    dma(i, slot).wait()
    delta = (i * jnp.int32(block_rows) - jnp.int32(halo)) - clamped_of(i)

    # shared lane-shifted windows (valid rows 0..win-2; taps with s≠0
    # have |r| ≤ halo-1 by the halo definition, so row win-1 is never
    # read — the same invariant the unpipelined kernel's base+1 row uses)
    for si, s in enumerate(shifts):
        zv[si, pl.ds(0, win - 1), :] = jnp.concatenate(
            [xv[slot, pl.ds(0, win - 1), pl.ds(s, LANES - s)],
             xv[slot, pl.ds(1, win - 1), pl.ds(0, s)]], axis=1)

    acc = jnp.zeros((block_rows, LANES), dtype=o_ref.dtype)
    for k, (r, s) in enumerate(_decompose(offsets)):
        base = 2 * halo + r + delta
        if s == 0:
            shifted = xv[slot, pl.ds(base, block_rows), :]
        else:
            shifted = zv[shifts.index(s), pl.ds(base, block_rows), :]
        acc = acc + d_ref[k] * shifted
    o_ref[:, :] = acc


def _dia_smooth_kernel(offsets, block_rows, halo, nrows, d_hbm, a_ref,
                       x_ref, r_ref, s_ref, coef_ref, xo_ref, ro_ref,
                       do_ref, sem):
    """Fused smoother step: t = A d; x' = x+d; r' = r−t; d' = c_a d +
    c_b (s ⊙ r'). Same clamped-window d DMA as _dia_kernel_nopad; all
    other operands ride BlockSpec VMEM blocks. coef = (c_a, c_b) in SMEM
    (traced scalars — λ_max lives on device)."""
    i = pl.program_id(0)
    copy = block_rows + 2 * halo
    win = block_rows + 4 * halo
    start = i * jnp.int32(block_rows) - jnp.int32(halo)
    clamped = jnp.minimum(jnp.maximum(start, jnp.int32(0)),
                          jnp.int32(nrows - copy))
    delta = start - clamped

    def body(dv):
        dv[pl.ds(0, halo), :] = jnp.zeros((halo, LANES), dtype=d_hbm.dtype)
        dv[pl.ds(copy + halo, halo), :] = jnp.zeros((halo, LANES),
                                                    dtype=d_hbm.dtype)
        dma = pltpu.make_async_copy(
            d_hbm.at[pl.ds(clamped, copy)],
            dv.at[pl.ds(halo, copy)], sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((block_rows, LANES), dtype=ro_ref.dtype)
        for k, (r, s) in enumerate(_decompose(offsets)):
            base = 2 * halo + r + delta
            if s == 0:
                shifted = dv[pl.ds(base, block_rows), :]
            else:
                hi = dv[pl.ds(base, block_rows), pl.ds(s, LANES - s)]
                lo = dv[pl.ds(base + 1, block_rows), pl.ds(0, s)]
                shifted = jnp.concatenate([hi, lo], axis=1)
            acc = acc + a_ref[k] * shifted
        d_blk = dv[pl.ds(2 * halo + delta, block_rows), :]
        r_new = r_ref[:, :] - acc
        xo_ref[:, :] = x_ref[:, :] + d_blk
        ro_ref[:, :] = r_new
        do_ref[:, :] = coef_ref[0] * d_blk + coef_ref[1] * (
            s_ref[:, :] * r_new)

    pl.run_scoped(
        body,
        pltpu.VMEM((win, LANES), d_hbm.dtype),
    )


def _dia_smooth_kernel_db(offsets, block_rows, halo, nrows, grid, d_hbm,
                          a_ref, x_ref, r_ref, s_ref, coef_ref, xo_ref,
                          ro_ref, do_ref, dv, zv, sem):
    """Pipelined _dia_smooth_kernel: 2-slot d window (next step's fetch
    rides under this step's compute) + shared lane-shifted windows."""
    i = pl.program_id(0)
    copy = block_rows + 2 * halo
    win = block_rows + 4 * halo
    shifts = _lane_shifts(offsets)

    def clamped_of(j):
        start = j * jnp.int32(block_rows) - jnp.int32(halo)
        return jnp.minimum(jnp.maximum(start, jnp.int32(0)),
                           jnp.int32(nrows - copy))

    def dma(j, slot):
        return pltpu.make_async_copy(
            d_hbm.at[pl.ds(clamped_of(j), copy)],
            dv.at[slot, pl.ds(halo, copy)], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dv[:, pl.ds(0, halo), :] = jnp.zeros((2, halo, LANES),
                                             dtype=d_hbm.dtype)
        dv[:, pl.ds(copy + halo, halo), :] = jnp.zeros(
            (2, halo, LANES), dtype=d_hbm.dtype)
        dma(0, jnp.int32(0)).start()

    @pl.when(i + 1 < grid)
    def _():
        dma(i + 1, jax.lax.rem(i + jnp.int32(1), jnp.int32(2))).start()

    slot = jax.lax.rem(i, jnp.int32(2))
    dma(i, slot).wait()
    delta = (i * jnp.int32(block_rows) - jnp.int32(halo)) - clamped_of(i)

    for si, s in enumerate(shifts):
        zv[si, pl.ds(0, win - 1), :] = jnp.concatenate(
            [dv[slot, pl.ds(0, win - 1), pl.ds(s, LANES - s)],
             dv[slot, pl.ds(1, win - 1), pl.ds(0, s)]], axis=1)

    acc = jnp.zeros((block_rows, LANES), dtype=ro_ref.dtype)
    for k, (r, s) in enumerate(_decompose(offsets)):
        base = 2 * halo + r + delta
        if s == 0:
            shifted = dv[slot, pl.ds(base, block_rows), :]
        else:
            shifted = zv[shifts.index(s), pl.ds(base, block_rows), :]
        acc = acc + a_ref[k] * shifted
    d_blk = dv[slot, pl.ds(2 * halo + delta, block_rows), :]
    r_new = r_ref[:, :] - acc
    xo_ref[:, :] = x_ref[:, :] + d_blk
    ro_ref[:, :] = r_new
    do_ref[:, :] = coef_ref[0] * d_blk + coef_ref[1] * (
        s_ref[:, :] * r_new)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "block_rows", "db",
                                    "interpret"))
def dia_smooth_step_pallas(data, x2d, r2d, d2d, s2d, coef, offsets,
                           block_rows: int | None = None,
                           db: bool | None = None,
                           interpret: bool = False):
    """Fused (x', r', d') smoother step on (R, 128) operands.

    coef: shape-(2,) f32 array (c_a, c_b). Requires the nopad-kernel
    window contract 3·halo ≤ R (callers fall back to the unfused path
    otherwise). db: pipelined kernel (default: module PIPELINE_DB)."""
    k, r, lanes = data.shape
    assert lanes == LANES
    if db is None:
        db = PIPELINE_DB
    h = halo_rows(offsets)
    if block_rows is None:
        block_rows = smooth_step_block_rows(k, r, offsets)
        assert block_rows is not None, (
            "fused step window infeasible — callers must fall back "
            "(dia.dia_smooth_step_fast)")
    assert r % block_rows == 0, (r, block_rows)
    assert block_rows + 2 * h <= r, "matrix too small for the fused kernel"
    grid = r // block_rows
    win = block_rows + 4 * h
    n_shift = len(_lane_shifts(offsets))

    if db:
        kernel = functools.partial(_dia_smooth_kernel_db, offsets,
                                   block_rows, h, r, grid)
        scratch = [
            pltpu.VMEM((2, win, LANES), data.dtype),
            pltpu.VMEM((max(n_shift, 1), win, LANES), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(_dia_smooth_kernel, offsets, block_rows,
                                   h, r)
        scratch = [pltpu.SemaphoreType.DMA(())]
    blk = lambda: pl.BlockSpec((block_rows, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # d: manual halo DMA
            pl.BlockSpec((k, block_rows, LANES),
                         lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            blk(), blk(), blk(),                 # x, r, s
            pl.BlockSpec((2,), lambda i: (i * 0,),  # i*0 keeps i32 under x64
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(blk(), blk(), blk()),
        out_shape=(jax.ShapeDtypeStruct((r, LANES), data.dtype),) * 3,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                _step_need(k, n_shift, block_rows, h)),
        ) if db else None,
        cost_estimate=pl.CostEstimate(
            flops=(2 * k + 5) * r * LANES,
            bytes_accessed=(k + 7) * r * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d2d, data, x2d, r2d, s2d, coef)
    return out


def _dia_cheb_kernel(offsets, block_rows, halo, steps, nrows, d_hbm, r_hbm,
                     s_hbm, a_hbm, x_ref, coef_ref, xo_ref, ro_ref, do_ref,
                     sem_d, sem_r, sem_s, sem_a):
    """Fused MULTI-step smoother sweep (temporal tiling): `steps`
    residual-carrying recurrence steps

        t = A d;  x += d;  r -= t;  d = c_a[j]·d + c_b[j]·(s ⊙ r)

    in ONE kernel launch. Each program loads an overlapping window wide
    enough to compute step j on a region shrinking by `halo` rows per
    side per step (redundant edge compute instead of inter-step kernel
    relaunches), so the A bands / r / s stream from HBM ONCE for the
    whole sweep instead of once per step.

    Window geometry (H = steps·halo): the program's B output rows need
    step-j values on G_j = [iB − (S−1−j)h, iB+B + (S−1−j)h) and d taps
    one halo beyond G_0, so d/r/s/A are DMA'd on copy = B + 2H rows,
    clamped into [0, R] with the same mid-window `delta` slot arithmetic
    as _dia_kernel_nopad; flanks of H rows are zeroed (outside-matrix
    reads see 0; outside-matrix writes land on s=r=0 rows and stay 0).
    x only accumulates on the output rows, so it rides a BlockSpec."""
    i = pl.program_id(0)
    big_h = steps * halo
    copy = block_rows + 2 * big_h
    win = block_rows + 4 * big_h
    start = i * jnp.int32(block_rows) - jnp.int32(big_h)
    clamped = jnp.minimum(jnp.maximum(start, jnp.int32(0)),
                          jnp.int32(nrows - copy))
    delta = start - clamped

    def body(dv, rv, sv, av):
        for v in (dv, rv, sv):
            v[pl.ds(0, big_h), :] = jnp.zeros((big_h, LANES),
                                              dtype=d_hbm.dtype)
            v[pl.ds(copy + big_h, big_h), :] = jnp.zeros(
                (big_h, LANES), dtype=d_hbm.dtype)
        av[:, pl.ds(0, big_h), :] = jnp.zeros(
            (av.shape[0], big_h, LANES), dtype=a_hbm.dtype)
        av[:, pl.ds(copy + big_h, big_h), :] = jnp.zeros(
            (av.shape[0], big_h, LANES), dtype=a_hbm.dtype)
        copies = [
            pltpu.make_async_copy(h.at[pl.ds(clamped, copy)],
                                  v.at[pl.ds(big_h, copy)], sem)
            for (h, v, sem) in [(d_hbm, dv, sem_d), (r_hbm, rv, sem_r),
                                (s_hbm, sv, sem_s)]
        ] + [pltpu.make_async_copy(a_hbm.at[:, pl.ds(clamped, copy)],
                                   av.at[:, pl.ds(big_h, copy)],
                                   sem_a)]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        # window slot of the program's first output row (global iB):
        # slot(g) = big_h + (g − clamped) ⇒ mid = 2·big_h + delta
        mid = 2 * big_h + delta
        x_acc = x_ref[:, :]
        for j in range(steps):
            ext = (steps - 1 - j) * halo          # step-j extra extent
            width = block_rows + 2 * ext
            lo = mid - ext                        # first slot computed
            acc = jnp.zeros((width, LANES), dtype=do_ref.dtype)
            for k, (rr, ss) in enumerate(_decompose(offsets)):
                base = lo + rr
                if ss == 0:
                    shifted = dv[pl.ds(base, width), :]
                else:
                    hi = dv[pl.ds(base, width), pl.ds(ss, LANES - ss)]
                    lo2 = dv[pl.ds(base + 1, width), pl.ds(0, ss)]
                    shifted = jnp.concatenate([hi, lo2], axis=1)
                acc = acc + av[k, pl.ds(lo, width), :] * shifted
            d_blk = dv[pl.ds(lo, width), :]
            r_new = rv[pl.ds(lo, width), :] - acc
            x_acc = x_acc + dv[pl.ds(mid, block_rows), :]
            rv[pl.ds(lo, width), :] = r_new
            dv[pl.ds(lo, width), :] = coef_ref[j, 0] * d_blk + (
                coef_ref[j, 1] * (sv[pl.ds(lo, width), :] * r_new))
        xo_ref[:, :] = x_acc
        ro_ref[:, :] = rv[pl.ds(mid, block_rows), :]
        do_ref[:, :] = dv[pl.ds(mid, block_rows), :]

    k = a_hbm.shape[0]
    pl.run_scoped(
        body,
        pltpu.VMEM((win, LANES), d_hbm.dtype),
        pltpu.VMEM((win, LANES), r_hbm.dtype),
        pltpu.VMEM((win, LANES), s_hbm.dtype),
        pltpu.VMEM((k, win, LANES), a_hbm.dtype),
    )


@functools.partial(jax.jit,
                   static_argnames=("offsets", "steps", "block_rows",
                                    "interpret"))
def dia_cheb_sweep_pallas(data, x2d, r2d, d2d, s2d, coefs, offsets,
                          steps: int, block_rows: int | None = None,
                          interpret: bool = False):
    """`steps` fused smoother steps in one launch (see _dia_cheb_kernel).

    coefs: (steps, 2) array of (c_a, c_b) per step. Requires the window
    contract B + 2·steps·halo ≤ R; callers fall back otherwise."""
    k, r, lanes = data.shape
    assert lanes == LANES
    h = halo_rows(offsets)
    big_h = steps * h
    if block_rows is None:
        block_rows = cheb_sweep_block_rows(k, r, offsets, steps)
        assert block_rows is not None, (
            "fused sweep window infeasible — callers must fall back "
            "(dia.dia_cheb_sweep_fast)")
    assert r % block_rows == 0, (r, block_rows)
    assert block_rows + 2 * big_h <= r, (
        "matrix too small for the fused sweep window")
    grid = r // block_rows

    kernel = functools.partial(_dia_cheb_kernel, offsets, block_rows, h,
                               steps, r)
    blk = lambda: pl.BlockSpec((block_rows, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)
    win = block_rows + 4 * big_h
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # d
            pl.BlockSpec(memory_space=pl.ANY),   # r
            pl.BlockSpec(memory_space=pl.ANY),   # s
            pl.BlockSpec(memory_space=pl.ANY),   # A bands
            blk(),                               # x
            pl.BlockSpec((coefs.shape[0], 2),
                         lambda i: (i * 0, i * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(blk(), blk(), blk()),
        out_shape=(jax.ShapeDtypeStruct((r, LANES), data.dtype),) * 3,
        scratch_shapes=[pltpu.SemaphoreType.DMA(())] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                _cheb_need(k, block_rows, big_h)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=steps * (2 * k + 5) * r * LANES,
            bytes_accessed=(k + 7) * r * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(d2d, r2d, s2d, data, x2d, coefs)
    return out


def _dia_apply_kernel(offsets, block_rows, halo, n_apps, n_rows_coef,
                      x_zero, want_res, nrows, *refs):
    """Fused WHOLE smoother application (solvers/smoothers.smooth_rx):

        r = b − A x          (elided when x_zero — then r = b)
        d = c₀·(s ⊙ r)
        repeat rows 1..:  t = A d;  x += d;  r −= t;  d = c_a d + c_b (s⊙r)
        return x + d [, r − A d when want_res]

    in ONE launch — the initial-residual matvec that smooth_rx(r=None)
    used to issue as a separate kernel is just the first A-application of
    the same shrinking-window schedule (temporal tiling identical to
    _dia_cheb_kernel: each of the n_apps stencil applications consumes
    `halo` rows of window per side)."""
    i = pl.program_id(0)
    big_h = n_apps * halo
    copy = block_rows + 2 * big_h
    win = block_rows + 4 * big_h
    start = i * jnp.int32(block_rows) - jnp.int32(big_h)
    clamped = jnp.minimum(jnp.maximum(start, jnp.int32(0)),
                          jnp.int32(nrows - copy))
    delta = start - clamped

    it = iter(refs)
    x_hbm = None if x_zero else next(it)
    b_hbm = next(it)
    s_hbm = next(it)
    a_hbm = next(it)
    coef_ref = next(it)
    xo_ref = next(it)
    ro_ref = next(it) if want_res else None
    sems = list(it)

    def stencil(av, v, lo, width):
        """Σ_k a_k ⊙ shift(v, o_k) on window rows [lo, lo+width)."""
        acc = jnp.zeros((width, LANES), dtype=v.dtype)
        for k, (rr, ss) in enumerate(_decompose(offsets)):
            base = lo + rr
            if ss == 0:
                shifted = v[pl.ds(base, width), :]
            else:
                hi = v[pl.ds(base, width), pl.ds(ss, LANES - ss)]
                lo2 = v[pl.ds(base + 1, width), pl.ds(0, ss)]
                shifted = jnp.concatenate([hi, lo2], axis=1)
            acc = acc + av[k, pl.ds(lo, width), :] * shifted
        return acc

    def body(*bufs):
        bufs = list(bufs)
        xv = None if x_zero else bufs.pop(0)
        rv, dv, sv, av = bufs

        vecs = ([] if x_zero else [(x_hbm, xv, sems[0])]) + [
            (b_hbm, rv, sems[-3]), (s_hbm, sv, sems[-2])]
        for _, v, _s in vecs:
            v[pl.ds(0, big_h), :] = jnp.zeros((big_h, LANES),
                                              dtype=b_hbm.dtype)
            v[pl.ds(copy + big_h, big_h), :] = jnp.zeros(
                (big_h, LANES), dtype=b_hbm.dtype)
        av[:, pl.ds(0, big_h), :] = jnp.zeros(
            (av.shape[0], big_h, LANES), dtype=a_hbm.dtype)
        av[:, pl.ds(copy + big_h, big_h), :] = jnp.zeros(
            (av.shape[0], big_h, LANES), dtype=a_hbm.dtype)
        copies = [
            pltpu.make_async_copy(h.at[pl.ds(clamped, copy)],
                                  v.at[pl.ds(big_h, copy)], sem)
            for (h, v, sem) in vecs
        ] + [pltpu.make_async_copy(a_hbm.at[:, pl.ds(clamped, copy)],
                                   av.at[:, pl.ds(big_h, copy)],
                                   sems[-1])]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        mid = 2 * big_h + delta
        aidx = 0
        # initial residual: rv holds b; subtract A x where still needed
        if not x_zero:
            ext = (n_apps - 1 - aidx) * halo
            width = block_rows + 2 * ext
            lo = mid - ext
            t = stencil(av, xv, lo, width)
            rv[pl.ds(lo, width), :] = rv[pl.ds(lo, width), :] - t
            aidx += 1
            x_acc = xv[pl.ds(mid, block_rows), :]
        else:
            x_acc = jnp.zeros((block_rows, LANES), dtype=b_hbm.dtype)
        # d = c0 · (s ⊙ r) on the region the remaining apps will consume
        ext = (n_apps - aidx) * halo
        width = block_rows + 2 * ext
        lo = mid - ext
        dv[pl.ds(lo, width), :] = coef_ref[0, 0] * (
            sv[pl.ds(lo, width), :] * rv[pl.ds(lo, width), :])
        for j in range(1, n_rows_coef):
            ext = (n_apps - 1 - aidx) * halo
            width = block_rows + 2 * ext
            lo = mid - ext
            t = stencil(av, dv, lo, width)
            x_acc = x_acc + dv[pl.ds(mid, block_rows), :]
            r_new = rv[pl.ds(lo, width), :] - t
            rv[pl.ds(lo, width), :] = r_new
            dv[pl.ds(lo, width), :] = coef_ref[j, 0] * dv[
                pl.ds(lo, width), :] + coef_ref[j, 1] * (
                sv[pl.ds(lo, width), :] * r_new)
            aidx += 1
        if want_res:
            t = stencil(av, dv, mid, block_rows)
            xo_ref[:, :] = x_acc + dv[pl.ds(mid, block_rows), :]
            ro_ref[:, :] = rv[pl.ds(mid, block_rows), :] - t
        else:
            xo_ref[:, :] = x_acc + dv[pl.ds(mid, block_rows), :]

    k = a_hbm.shape[0]
    scoped = ([] if x_zero else [pltpu.VMEM((win, LANES), b_hbm.dtype)]) + [
        pltpu.VMEM((win, LANES), b_hbm.dtype),   # r (starts as b)
        pltpu.VMEM((win, LANES), b_hbm.dtype),   # d
        pltpu.VMEM((win, LANES), b_hbm.dtype),   # s
        pltpu.VMEM((k, win, LANES), a_hbm.dtype),
    ]
    pl.run_scoped(body, *scoped)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "x_zero", "want_res",
                                    "block_rows", "interpret"))
def dia_smooth_apply_pallas(data, x2d, b2d, s2d, coefs, offsets,
                            x_zero: bool, want_res: bool,
                            block_rows: int | None = None,
                            interpret: bool = False):
    """One COMPLETE smoother application as a single launch (see
    _dia_apply_kernel). coefs: (n_rows, 2); row 0 = (init_scale, ·) for
    d = init_scale·(s⊙r), rows 1.. = (c_a, c_b). x2d is ignored
    mathematically when x_zero (the r = b − A x matvec is elided; pass
    zeros). Returns x' or (x', r') when want_res. Requires the window
    contract B + 2·n_apps·halo ≤ R (callers fall back otherwise)."""
    k, r, lanes = data.shape
    assert lanes == LANES
    n_rows_coef = int(coefs.shape[0])
    n_apps = (0 if x_zero else 1) + (n_rows_coef - 1) + (1 if want_res
                                                         else 0)
    assert n_apps >= 1, "nothing to fuse (no stencil application)"
    h = halo_rows(offsets)
    big_h = n_apps * h
    if block_rows is None:
        block_rows = smooth_apply_block_rows(k, r, offsets, n_apps,
                                             x_zero, want_res)
        assert block_rows is not None, (
            "fused apply window infeasible — callers must fall back "
            "(dia.dia_smooth_apply_fast)")
    assert r % block_rows == 0, (r, block_rows)
    assert block_rows + 2 * big_h <= r, (
        "matrix too small for the fused apply window")
    grid = r // block_rows
    win = block_rows + 4 * big_h

    kernel = functools.partial(_dia_apply_kernel, offsets, block_rows, h,
                               n_apps, n_rows_coef, x_zero, want_res, r)
    n_vec_dma = (0 if x_zero else 1) + 2
    in_arrays = (() if x_zero else (x2d,)) + (b2d, s2d, data, coefs)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (n_vec_dma + 1) + [
        pl.BlockSpec((n_rows_coef, 2), lambda i: (i * 0, i * 0),
                     memory_space=pltpu.SMEM)]
    blk = lambda: pl.BlockSpec((block_rows, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM)
    n_out = 2 if want_res else 1
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(blk(), blk()) if want_res else blk(),
        out_shape=tuple(jax.ShapeDtypeStruct((r, LANES), data.dtype)
                        for _ in range(n_out)) if want_res
        else jax.ShapeDtypeStruct((r, LANES), data.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())] * (n_vec_dma + 1),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                _apply_need(k, 3 if x_zero else 4, n_out, block_rows,
                            big_h)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_apps * (2 * k + 5) * r * LANES,
            bytes_accessed=(k + 3 + n_vec_dma) * r * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*in_arrays)
    return out


@functools.partial(jax.jit, static_argnames=("offsets", "block_rows", "db",
                                              "interpret"))
def dia_spmv_pallas_nopad(data, x2d, offsets, block_rows: int | None = None,
                          db: bool | None = None, interpret: bool = False):
    """Unpadded-x variant: data (K, R, 128), x2d (R, 128) → y (R, 128).

    db: double-buffered pipelined kernel (default: module PIPELINE_DB)."""
    k, r, lanes = data.shape
    assert lanes == LANES
    assert x2d.shape == (r, LANES), (x2d.shape, r)
    if db is None:
        db = PIPELINE_DB
    h = halo_rows(offsets)
    if block_rows is None:
        vmem_budget = 4 * 1024 * 1024
        target = max(8, min(r, vmem_budget // (max(k, 1) * LANES * 4)))
        block_rows = 1
        while (block_rows * 2 <= target) and (r % (block_rows * 2) == 0):
            block_rows *= 2
        # clamp window must fit inside the matrix: B + 2h ≤ R
        while block_rows > 1 and block_rows + 2 * h > r:
            block_rows //= 2
    assert r % block_rows == 0, (r, block_rows)
    assert block_rows + 2 * h <= r, (
        "matrix too small for the nopad kernel window")
    grid = r // block_rows
    win = block_rows + 4 * h
    n_shift = len(_lane_shifts(offsets))

    if db:
        kernel = functools.partial(_dia_kernel_nopad_db, offsets,
                                   block_rows, h, r, grid)
        scratch = [
            pltpu.VMEM((2, win, LANES), data.dtype),            # xv slots
            pltpu.VMEM((max(n_shift, 1), win, LANES), data.dtype),  # zv
            pltpu.SemaphoreType.DMA((2,)),
        ]
        vmem_bytes = ((2 + max(n_shift, 1)) * win
                      + 2 * (k + 1) * block_rows) * LANES * 4
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_bytes + 4 * 1024 * 1024)
    else:
        kernel = functools.partial(_dia_kernel_nopad, offsets, block_rows,
                                   h, r)
        scratch = [pltpu.SemaphoreType.DMA(())]
        compiler_params = None
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, block_rows, LANES),
                         lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, LANES), data.dtype),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * r * LANES,
            bytes_accessed=(k + 2) * r * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, data)


@functools.partial(jax.jit, static_argnames=("offsets", "block_rows"))
def dia_spmv_pallas(data, x_padded, offsets, block_rows: int | None = None):
    """data: (K, R, 128); x_padded: (R + 2H, 128) with H = halo_rows.

    Returns y: (R, 128)."""
    k, r, lanes = data.shape
    assert lanes == LANES
    h = halo_rows(offsets)
    assert x_padded.shape == (r + 2 * h, LANES), (x_padded.shape, r, h)
    if block_rows is None:
        # largest power-of-2 divisor of r that fits the VMEM budget — big
        # blocks amortize the per-program DMA + dispatch cost
        vmem_budget = 4 * 1024 * 1024
        target = max(8, min(r, vmem_budget // (max(k, 1) * LANES * 4)))
        block_rows = 1
        while (block_rows * 2 <= target) and (r % (block_rows * 2) == 0):
            block_rows *= 2
    assert r % block_rows == 0, (r, block_rows)
    grid = r // block_rows

    kernel = functools.partial(_dia_kernel, offsets, block_rows, h)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((k, block_rows, LANES), lambda i: (i * 0, i, i * 0),  # i*0 keeps i32 under x64
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, LANES), data.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * (block_rows + 2 * h) * LANES * 4
            + 4 * max(k, 1) * block_rows * LANES * 4 + 4 * block_rows * LANES * 4,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * r * LANES,
            bytes_accessed=(k + 2) * r * LANES * 4,
            transcendentals=0,
        ),
    )(x_padded, data)
