"""Double-single (two-float32) arithmetic for TPU-native f64-quality
residuals.

TPU has no hardware f64 — XLA software-emulates it, and the emulated
DIA SpMV in the iterative-refinement outer loop (solvers/refine.py) is
a large fixed cost per outer sweep. This module computes the outer
residual r = b − A·x in COMPENSATED f32: every value is an unevaluated
pair (hi, lo) of f32 with |lo| ≤ ulp(hi)/2, giving ≈2⁻⁴⁸ effective
precision — enough headroom for the reference's 1e-8 relative-residual
target (common/amg_solver.h:33) on equilibrated operators.

Number-system primitives are the classical error-free transformations
(Dekker 1971, Knuth TAOCP §4.2.2), written contraction-safe:

  * two_sum: 6-flop branch-free exact addition (no magnitude ordering);
  * two_prod via Veltkamp splitting: the 12-bit half products are exact
    in f32 whether or not the compiler contracts mul+add into FMA.

The same jnp expressions run inside Pallas kernels (Mosaic) and in
plain XLA, so the Pallas residual kernel and the portable jnp reference
path share one arithmetic core; parity is pinned against a numpy
float128 oracle in tests/test_double_single.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dia import DIA, _rolled

LANES = 128

# Veltkamp split constant for f32 (p = 24 bits → s = 12): 2¹² + 1
_SPLIT = np.float32(4097.0)


def two_sum(a, b):
    """Exact addition: a + b = s + e with s = fl(a + b). Branch-free
    (Knuth), valid for any magnitudes."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Veltkamp split: a = hi + lo with hi, lo ≤ 12 significant bits."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a·b = p + e with p = fl(a·b). Half products of
    12-bit splits are exact in f32, so this stays exact whether or not
    mul+add contracts to FMA."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def ds_add(hi, lo, bhi, blo):
    """(hi, lo) + (bhi, blo), renormalized."""
    s, e = two_sum(hi, bhi)
    e = e + (lo + blo)
    # fast renormalization: |e| ≪ |s| after two_sum
    hi2 = s + e
    return hi2, e - (hi2 - s)


def ds_split(x) -> tuple[np.ndarray, np.ndarray]:
    """Host split of an f64 array into an exact (hi, lo) f32 pair."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def ds_split_dia(a_hi64: DIA) -> tuple[DIA, jax.Array]:
    """Split an f64 DIA operator into (hi DIA, lo data) f32 pair."""
    data = np.asarray(a_hi64.data, dtype=np.float64)
    hi, lo = ds_split(data)
    return (DIA(data=jnp.asarray(hi), offsets=a_hi64.offsets,
                n=a_hi64.n, nnz=a_hi64.nnz), jnp.asarray(lo))


def from_csr_ds(a, cols: int = LANES, max_offsets: int | None = None):
    """CSR (f64 host values) → (hi DIA, lo data) without ever creating
    an f64 jnp array — works with jax_enable_x64 OFF (the point of the
    ds path). Returns None when the matrix has no DIA structure."""
    from .dia import csr_to_dia_host

    host = csr_to_dia_host(a, dtype=np.float64, cols=cols,
                           max_offsets=max_offsets)
    if host is None:
        return None
    data, offs, n, nnz = host
    hi, lo = ds_split(data)
    return (DIA(data=jnp.asarray(hi), offsets=offs, n=n, nnz=nnz),
            jnp.asarray(lo))


def _tap_accumulate(acc_hi, acc_lo, a_hi_k, a_lo_k, xh, xl):
    """acc += (a_hi + a_lo)·(xh + xl) in double-single.

    two_prod captures the dominant a_hi·xh rounding error; the cross
    terms are ~2⁻²⁴ of the product, so plain f32 is exact enough for
    them (their own rounding is ~2⁻⁴⁸ of the tap)."""
    p, perr = two_prod(a_hi_k, xh)
    tap_lo = perr + (a_hi_k * xl + a_lo_k * xh + a_lo_k * xl)
    return ds_add(acc_hi, acc_lo, p, tap_lo)


def dia_residual_ds_ref(a_hi: DIA, a_lo, xh, xl, bh, bl):
    """Portable jnp path: r = b − A x in double-single on the (R, C)
    roll layout (same taps as dia.dia_spmv). Returns (r_hi, r_lo) of
    length n."""
    c = a_hi.cols
    rc = a_hi.data.shape[1] * c

    def pad2(v):
        if v.shape[0] != rc:
            v = jnp.pad(v, (0, rc - v.shape[0]))
        return v.reshape(-1, c)

    xh2, xl2 = pad2(xh), pad2(xl)
    acc_hi = jnp.zeros_like(xh2)
    acc_lo = jnp.zeros_like(xh2)
    for k, o in enumerate(a_hi.offsets):
        acc_hi, acc_lo = _tap_accumulate(
            acc_hi, acc_lo, a_hi.data[k], a_lo[k],
            _rolled(xh2, o, c), _rolled(xl2, o, c))
    r_hi, r_lo = ds_add(pad2(bh), pad2(bl), -acc_hi, -acc_lo)
    r_hi, r_lo = r_hi.reshape(-1), r_lo.reshape(-1)
    if a_hi.n != rc:
        return r_hi[: a_hi.n], r_lo[: a_hi.n]
    return r_hi, r_lo


# --------------------------------------------------------------------------
# Pallas kernel: manual halo-window DMA (the dia_spmv_pallas pattern)
# --------------------------------------------------------------------------
def _residual_kernel(offsets, block_rows, halo, xh_hbm, xl_hbm, ah_ref,
                     al_ref, bh_ref, bl_ref, oh_ref, ol_ref, semh, seml):
    from .pallas_spmv import _decompose

    i = pl.program_id(0)

    def body(xhv, xlv):
        dh = pltpu.make_async_copy(
            xh_hbm.at[pl.ds(i * block_rows, block_rows + 2 * halo)],
            xhv, semh)
        dl = pltpu.make_async_copy(
            xl_hbm.at[pl.ds(i * block_rows, block_rows + 2 * halo)],
            xlv, seml)
        dh.start()
        dl.start()
        dh.wait()
        dl.wait()

        def shifted(xv, base, s):
            if s == 0:
                return xv[pl.ds(base, block_rows), :]
            hi = xv[pl.ds(base, block_rows), pl.ds(s, LANES - s)]
            lo = xv[pl.ds(base + 1, block_rows), pl.ds(0, s)]
            return jnp.concatenate([hi, lo], axis=1)

        acc_hi = jnp.zeros((block_rows, LANES), dtype=oh_ref.dtype)
        acc_lo = jnp.zeros((block_rows, LANES), dtype=oh_ref.dtype)
        for k, (r, s) in enumerate(_decompose(offsets)):
            base = halo + r
            acc_hi, acc_lo = _tap_accumulate(
                acc_hi, acc_lo, ah_ref[k], al_ref[k],
                shifted(xhv, base, s), shifted(xlv, base, s))
        r_hi, r_lo = ds_add(bh_ref[:, :], bl_ref[:, :], -acc_hi, -acc_lo)
        oh_ref[:, :] = r_hi
        ol_ref[:, :] = r_lo

    win = block_rows + 2 * halo
    pl.run_scoped(
        body,
        pltpu.VMEM((win, LANES), xh_hbm.dtype),
        pltpu.VMEM((win, LANES), xl_hbm.dtype),
    )


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def _residual_call(ah, al, xh_pad, xl_pad, bh2, bl2, offsets,
                   interpret=False):
    from .pallas_spmv import _VMEM_HARD_CAP, halo_rows

    k, r, lanes = ah.shape
    assert lanes == LANES
    h = halo_rows(offsets)
    # block choice: same power-of-2-divisor policy as dia_spmv_pallas,
    # budget sized for the doubled operand streams
    budget = 4 * 1024 * 1024
    block_rows = 1
    target = max(8, min(r, budget // (2 * max(k, 1) * LANES * 4)))
    while (block_rows * 2 <= target) and (r % (block_rows * 2) == 0):
        block_rows *= 2
    grid = r // block_rows
    win = block_rows + 2 * h
    # 2 x-windows + double-buffered (2k + 4) operand/output blocks
    need = (2 * win + 2 * (2 * k + 8) * block_rows) * LANES * 4
    vmem = min(int(need * 1.5) + 4 * 1024 * 1024, _VMEM_HARD_CAP)

    kern = functools.partial(_residual_kernel, offsets, block_rows, h)
    blk = lambda i: (i * 0, i, i * 0)  # noqa: E731
    vec = lambda i: (i, i * 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xh (HBM, manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # xl
            pl.BlockSpec((k, block_rows, LANES), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_rows, LANES), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), vec, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.float32)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        cost_estimate=pl.CostEstimate(
            flops=35 * k * r * LANES,
            bytes_accessed=(2 * k + 6) * r * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xh_pad, xl_pad, ah, al, bh2, bl2)


def dia_residual_ds(a_hi: DIA, a_lo, xh, xl, bh, bl,
                    interpret: bool = False):
    """r = b − A x in double-single via one Pallas launch.

    a_hi/a_lo: the ds-split operator (ds_split_dia); xh/xl, bh/bl flat
    (n,) f32 pairs. Returns (r_hi, r_lo) flat (n,)."""
    from .pallas_spmv import halo_rows

    assert a_hi.cols == LANES
    r = a_hi.data.shape[1]
    rc = r * LANES
    h = halo_rows(a_hi.offsets)

    def pad2(v):
        if v.shape[0] != rc:
            v = jnp.pad(v, (0, rc - v.shape[0]))
        return v.reshape(r, LANES)

    xh_pad = jnp.pad(pad2(xh), ((h, h), (0, 0)))
    xl_pad = jnp.pad(pad2(xl), ((h, h), (0, 0)))
    r_hi, r_lo = _residual_call(a_hi.data, a_lo, xh_pad, xl_pad,
                                pad2(bh), pad2(bl), a_hi.offsets,
                                interpret=interpret)
    r_hi, r_lo = r_hi.reshape(-1), r_lo.reshape(-1)
    if a_hi.n != rc:
        return r_hi[: a_hi.n], r_lo[: a_hi.n]
    return r_hi, r_lo
