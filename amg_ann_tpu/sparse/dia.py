"""DIA (diagonal) sparse format — the TPU fast path for banded operators.

Structured-grid elliptic operators (7/27-point stencils, tensor-product
FEM) have a handful of distinct column−row offsets. Storing one dense
coefficient vector per offset turns SpMV into

    y = Σ_k  d_k ⊙ roll(x, −o_k)

pure shifted vector multiply-adds: no gather (XLA's TPU gather measured
~0.11 Gnnz/s), full VPU/HBM throughput instead.

Correctness with circular rolls: rows where offset o_k walks off the
matrix carry a ZERO coefficient in d_k by construction (the entry does not
exist in the CSR), so wrapped values are annihilated — no masking needed.

Device layout: x and each d_k reshaped to (R, C) with C a multiple of the
lane width; a global shift by o decomposes into a row shift (o // C,
free addressing) plus a lane shift (o % C).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .csr import CSR


@struct.dataclass
class DIA:
    """Diagonal-format sparse matrix (square), device pytree."""

    data: jax.Array   # (K, R, C) per-offset coefficients, row-major flat
    offsets: tuple = struct.field(pytree_node=False)   # K ints
    n: int = struct.field(pytree_node=False)           # true dimension
    nnz: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def cols(self) -> int:
        return self.data.shape[2]

    def __matmul__(self, x):
        return dia_spmv(self, x)


def padded_rows(n: int, cols: int = 128) -> int:
    """Device row count R for an n-dof DIA operand: ceil(n/cols) rounded
    up to a Pallas-friendly multiple. Kernel blocks must divide R, so R's
    largest power-of-two divisor bounds the block size; awkward grids
    (129³ → 16771 rows) would otherwise leave 8, degrading the kernels to
    8-row blocks whose halo windows amplify DMA traffic ~35× (measured:
    blows the axon RPC deadline at 129³). Padding rows carry zero
    coefficients — the standard DIA wrap-annihilation contract."""
    r = -(-n // cols)
    m = 512 if r >= 8192 else (256 if r >= 2048 else
                               (64 if r >= 512 else 8))
    return -(-r // m) * m


def num_offsets(a: CSR) -> int:
    rows, cols, _ = a.row_expand()
    return np.unique(cols - rows).size


def csr_to_dia_host(a: CSR, dtype=None, cols: int = 128,
                    max_offsets: int | None = None):
    """Host-side DIA conversion: (data (K, R, cols) numpy, offsets, n,
    nnz), or None if non-square / too many offsets. Zero-valued stored
    entries are dropped (they carry no information for SpMV and would
    add offsets)."""
    if a.nrows != a.ncols:
        return None
    if dtype is None:
        dtype = a.data.dtype
    rows, cls, vals = a.row_expand()
    keep = vals != 0
    rows, cls, vals = rows[keep], cls[keep], vals[keep]
    offs = np.unique(cls - rows)
    if max_offsets is not None and offs.size > max_offsets:
        return None
    n = a.nrows
    r = padded_rows(n, cols)
    data = np.zeros((max(offs.size, 1), r * cols), dtype=dtype)
    k_of = {int(o): k for k, o in enumerate(offs)}
    ks = np.array([k_of[int(o)] for o in (cls - rows)], dtype=np.int64)
    data[ks, rows] = vals
    return (data.reshape(-1, r, cols), tuple(int(o) for o in offs), n,
            int(keep.sum()))


def from_csr_dia(a: CSR, dtype=None, cols: int = 128,
                 max_offsets: int | None = None) -> DIA | None:
    """Convert a square CSR to DIA, or None if it has too many offsets."""
    host = csr_to_dia_host(a, dtype=dtype, cols=cols,
                           max_offsets=max_offsets)
    if host is None:
        return None
    data, offs, n, nnz = host
    return DIA(data=jnp.asarray(data), offsets=offs, n=n, nnz=nnz)


def _rolled(x2, o: int, c: int):
    """roll(flat x, −o) expressed on the (R, C) view."""
    r, s = divmod(o, c)  # o = r*c + s, 0 <= s < c
    xs = x2
    if s:
        nxt = jnp.roll(x2, -1, axis=0)
        xs = jnp.concatenate([x2[:, s:], nxt[:, :s]], axis=1)
    if r:
        xs = jnp.roll(xs, -r, axis=0)
    return xs


def dia_spmv(a: DIA, x: jax.Array) -> jax.Array:
    """y = A @ x (portable jnp path). Accepts x of length n or R·C."""
    c = a.cols
    rc = a.data.shape[1] * c
    if x.shape[0] != rc:
        x = jnp.pad(x, (0, rc - x.shape[0]))
    x2 = x.reshape(-1, c)
    y = jnp.zeros_like(x2)
    for k, o in enumerate(a.offsets):
        y = y + a.data[k] * _rolled(x2, o, c)
    return y.reshape(-1)[: a.n] if a.n != rc else y.reshape(-1)


def dia_spmv_fast(a: DIA, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x via the Pallas banded kernel (requires cols == 128).

    x of length n; returns length n. Pads x with the halo rows the kernel
    contract requires (zeros — exact, see pallas_spmv docstring).
    """
    from . import pallas_spmv as _ps
    from .pallas_spmv import (
        LANES, dia_spmv_pallas, dia_spmv_pallas_nopad, halo_rows,
    )

    assert a.cols == LANES, f"pallas DIA kernel needs cols=128, got {a.cols}"
    r = a.data.shape[1]
    rc = r * LANES
    if x.shape[0] != rc:
        x = jnp.pad(x, (0, rc - x.shape[0]))
    h = halo_rows(a.offsets)
    if not interpret and 3 * h <= r:
        # fast path: no host-side halo pad — boundary handling in-kernel
        y = dia_spmv_pallas_nopad(a.data, x.reshape(r, LANES), a.offsets,
                                  db=_ps.PIPELINE_DB)
        return y.reshape(-1)[: a.n] if a.n != rc else y.reshape(-1)
    xp = jnp.pad(x.reshape(r, LANES), ((h, h), (0, 0)))
    fn = dia_spmv_pallas
    if interpret:
        import functools

        from jax.experimental import pallas as pl

        from . import pallas_spmv as ps

        fn = jax.jit(functools.partial(_interp_call, ps),
                     static_argnames=("offsets",))
    y = fn(a.data, xp, a.offsets)
    return y.reshape(-1)[: a.n] if a.n != rc else y.reshape(-1)


def dia_smooth_step_fast(a: DIA, x, r, d, s, c_a, c_b,
                         interpret: bool = False):
    """Fused smoother step (solvers/ops.op_smooth_step contract) via the
    Pallas kernel: t = A d; x' = x+d; r' = r−t; d' = c_a d + c_b (s⊙r').

    Falls back to matvec + elementwise when the matrix is too small for
    the kernel's clamped window (3·halo > R) or off-TPU (pass
    interpret=True to exercise the kernel logic on CPU)."""
    from . import pallas_spmv as _ps
    from .pallas_spmv import (
        LANES, dia_smooth_step_pallas, halo_rows, smooth_step_block_rows,
    )

    rr = a.data.shape[1]
    rc = rr * LANES
    h = halo_rows(a.offsets)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    feasible = (a.cols == LANES and
                smooth_step_block_rows(a.data.shape[0], rr,
                                       a.offsets) is not None)
    if not feasible or not (on_tpu or interpret):
        t = dia_spmv(a, d)
        x2 = x + d
        r2 = r - t
        return x2, r2, c_a * d + c_b * (s * r2)

    def pad(v):
        return jnp.pad(v, (0, rc - v.shape[0])) if v.shape[0] != rc else v

    coef = jnp.stack([jnp.asarray(c_a, dtype=a.data.dtype),
                      jnp.asarray(c_b, dtype=a.data.dtype)])
    xo, ro, do = dia_smooth_step_pallas(
        a.data, pad(x).reshape(rr, LANES), pad(r).reshape(rr, LANES),
        pad(d).reshape(rr, LANES), pad(s).reshape(rr, LANES), coef,
        a.offsets, db=_ps.PIPELINE_DB, interpret=interpret)
    n = a.n
    unpad = (lambda v: v.reshape(-1)[:n]) if n != rc else (
        lambda v: v.reshape(-1))
    return unpad(xo), unpad(ro), unpad(do)


def dia_cheb_sweep_fast(a: DIA, x, r, d, s, coefs, interpret: bool = False):
    """`coefs.shape[0]` fused residual-carrying smoother steps in ONE
    Pallas launch (sparse/pallas_spmv.dia_cheb_sweep_pallas): the A bands,
    r and s stream from HBM once for the whole Chebyshev sweep instead of
    once per step (temporal tiling with overlapping halo windows).

    Falls back to the per-step loop when the matrix is too small for the
    sweep window or off-TPU (interpret=True exercises the kernel on CPU).
    """
    from .pallas_spmv import (
        LANES, cheb_sweep_block_rows, dia_cheb_sweep_pallas, halo_rows,
    )

    steps = int(coefs.shape[0])
    rr = a.data.shape[1]
    rc = rr * LANES
    h = halo_rows(a.offsets)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    feasible = (a.cols == LANES and
                cheb_sweep_block_rows(a.data.shape[0], rr, a.offsets,
                                      steps) is not None)
    if not feasible or not (on_tpu or interpret):
        if (on_tpu or interpret) and a.cols == LANES and steps > 1:
            # too many fused steps for the vmem window — bisect the
            # sweep into smaller fused launches (each half recursively
            # finds its own feasible chunk size)
            half = steps // 2
            x, r, d = dia_cheb_sweep_fast(a, x, r, d, s, coefs[:half],
                                          interpret=interpret)
            return dia_cheb_sweep_fast(a, x, r, d, s, coefs[half:],
                                       interpret=interpret)
        for j in range(steps):
            t = dia_spmv(a, d)
            x = x + d
            r = r - t
            d = coefs[j, 0] * d + coefs[j, 1] * (s * r)
        return x, r, d

    def pad(v):
        return jnp.pad(v, (0, rc - v.shape[0])) if v.shape[0] != rc else v

    xo, ro, do = dia_cheb_sweep_pallas(
        a.data, pad(x).reshape(rr, LANES), pad(r).reshape(rr, LANES),
        pad(d).reshape(rr, LANES), pad(s).reshape(rr, LANES),
        coefs.astype(a.data.dtype), a.offsets, steps, interpret=interpret)
    n = a.n
    unpad = (lambda v: v.reshape(-1)[:n]) if n != rc else (
        lambda v: v.reshape(-1))
    return unpad(xo), unpad(ro), unpad(do)


def dia_smooth_apply_fast(a: DIA, x, b, s, coefs, x_zero: bool,
                          want_res: bool, interpret: bool = False):
    """One COMPLETE smoother application in ONE Pallas launch
    (sparse/pallas_spmv.dia_smooth_apply_pallas): the initial residual
    r = b − A x (elided when x_zero), the d = c₀(s⊙r) seed, every
    recurrence step, and the optional output residual all share one
    shrinking-window schedule — smooth_rx(r=None) stops costing a
    separate matvec launch.

    Returns (x', r' or None). Falls back to matvec + dia_cheb_sweep_fast
    when the matrix is too small for the window or off-TPU."""
    from .pallas_spmv import (
        LANES, dia_smooth_apply_pallas, halo_rows, smooth_apply_block_rows,
    )

    n_rows = int(coefs.shape[0])
    n_apps = (0 if x_zero else 1) + (n_rows - 1) + (1 if want_res else 0)
    rr = a.data.shape[1]
    rc = rr * LANES
    h = halo_rows(a.offsets)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    feasible = (a.cols == LANES and n_apps >= 1 and
                smooth_apply_block_rows(a.data.shape[0], rr, a.offsets,
                                        n_apps, x_zero,
                                        want_res) is not None)
    if not feasible or not (on_tpu or interpret):
        r = b if x_zero else b - dia_spmv(a, x)
        d = coefs[0, 0] * (s * r)
        if n_rows > 1:
            if x_zero:
                x = jnp.zeros_like(b)
            # recurrence steps still ride the fused sweep kernel (which
            # itself bisects into vmem-feasible chunks)
            x, r, d = dia_cheb_sweep_fast(a, x, r, d, s, coefs[1:],
                                          interpret=interpret)
        else:
            if x_zero:
                x = jnp.zeros_like(b)
        if want_res:
            return x + d, r - dia_spmv(a, d)
        return x + d, None

    def pad(v):
        return jnp.pad(v, (0, rc - v.shape[0])) if v.shape[0] != rc else v

    x2 = (jnp.zeros((rr, LANES), a.data.dtype) if x_zero
          else pad(x).reshape(rr, LANES))
    out = dia_smooth_apply_pallas(
        a.data, x2, pad(b).reshape(rr, LANES), pad(s).reshape(rr, LANES),
        coefs.astype(a.data.dtype), a.offsets, x_zero, want_res,
        interpret=interpret)
    n = a.n
    unpad = (lambda v: v.reshape(-1)[:n]) if n != rc else (
        lambda v: v.reshape(-1))
    if want_res:
        return unpad(out[0]), unpad(out[1])
    return unpad(out), None


def _interp_call(ps, data, xp, offsets):
    # interpret-mode twin of dia_spmv_pallas for CPU testing
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, r, lanes = data.shape
    h = ps.halo_rows(offsets)
    block_rows = r  # single block in interpret mode
    kernel = functools.partial(ps._dia_kernel, offsets, block_rows, h)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, block_rows, lanes), lambda i: (i * 0, i, i * 0),  # i*0 keeps i32 under x64
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, lanes), lambda i: (i, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, lanes), data.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        interpret=True,
    )(xp, data)
