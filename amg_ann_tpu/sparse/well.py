"""WELL — windowed ELL: the TPU-fast sparse format for UNSTRUCTURED matrices.

The classical (tc1 / unstructured-mesh) path stored operators as padded ELL
and paid XLA's TPU gather for `x[cols]` — measured ~0.11 Gnnz/s, ~600× below
HBM speed of light (CLAUDE.md measured facts). WELL replaces that gather
with a Pallas kernel built on the one gather primitive Mosaic lowers fast:
`tpu.dynamic_gather` along the 128-lane axis of a 2D tile
(jnp.take_along_axis(src, idx, axis=1)).

Layout (after a bandwidth-reducing RCM reorder of the matrix):

  * rows are padded to BLOCK=1024-row blocks: lane l∈[0,128) × subrow
    i∈[0,8) → row = 1024·b + 128·i + l.
  * per row, K value slots (ELL width); slot k of the block is stored at
    sublane-row u = k·8 + i  ⇒  data/lcol arrays are (nblk, K·8, 128).
  * per block, a column WINDOW [128·w0(b), 128·(w0(b)+snum(b))) covers every
    column the block touches; `lcol` stores column − 128·w0(b). After RCM
    the window is O(matrix bandwidth) — that locality is what makes the
    kernel fast.
  * x lives in VMEM reshaped (nseg, 128). The kernel loops s over the
    block's snum(b) window segments: broadcast x-segment s across sublanes,
    lane-gather it at `lcol & 127`, and accumulate slots whose segment
    (`lcol >> 7`) equals s. All arithmetic is full-width (K·8, 128) VPU ops.

Cost: O(Σ_b snum(b) · K · 1024) VPU flops + one streaming pass over
data/lcol — for FEM matrices with RCM bandwidth β this is ~4·K·β/128 ops
per row, independent of XLA gather performance.

Replaces the device-side role of PETSc MatMult inside KSP CG for the
reference's unstructured testcase 1 (reference: common/amg_solver.h:54,
testcase1-diffusion-unstructured/src/main.cpp — note the reference itself
offers Cuthill–McKee renumbering, main.cpp:179-194; WELL makes that
bandwidth structure a performance primitive).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .csr import CSR

BLOCK = 1024          # rows per block: 8 subrows × 128 lanes
_LANES = 128

# full-x-in-VMEM budget: beyond this the reference (XLA gather) path runs.
# v5e VMEM ≈ 64 MB/core but Mosaic scoped allocations + double-buffered
# slot blocks need headroom; 16 MB of x covers n ≤ 4M dofs.
X_VMEM_BYTES = int(16e6)


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


@struct.dataclass
class WELL:
    """Windowed-ELL sparse matrix (device pytree; static shape metadata)."""

    data: jax.Array   # (nblk, K*8, 128) values, 0 in padding slots
    lcol: jax.Array   # (nblk, K*8, 128) int32 column − 128·w0[b]
    w0: jax.Array     # (nblk,) int32 window start segment
    snum: jax.Array   # (nblk,) int32 window length in segments
    nrows: int = struct.field(pytree_node=False)   # true rows
    ncols: int = struct.field(pytree_node=False)   # true cols
    nnz: int = struct.field(pytree_node=False)
    s_max: int = struct.field(pytree_node=False)   # max(snum) (static)

    @property
    def nblk(self) -> int:
        return self.data.shape[0]

    @property
    def k(self) -> int:
        return self.data.shape[1] // 8

    @property
    def padded_rows(self) -> int:
        return self.data.shape[0] * BLOCK

    @property
    def nseg(self) -> int:
        """x storage segments (ncols padded up to the lane width)."""
        return _ceil(max(self.ncols, 1), _LANES)

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    def __matmul__(self, x):
        return spmv(self, x)


def rcm_perm(a: CSR) -> np.ndarray:
    """Reverse Cuthill–McKee ordering of a's symmetrized pattern.

    perm[i] = original index placed at position i. RCM minimizes the
    bandwidth WELL's window size (and hence kernel cost) scales with."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    m = sp.csr_matrix(
        (np.ones(a.nnz, dtype=np.int8), a.indices, a.indptr), shape=a.shape)
    return np.asarray(
        reverse_cuthill_mckee(m, symmetric_mode=True), dtype=np.int64)


def permute_sym(a: CSR, perm: np.ndarray) -> CSR:
    """A[perm][:, perm] — symmetric reorder (solve in permuted variables)."""
    return permute(a, perm, perm)


def window_cost(a: CSR) -> int:
    """Σ_b window segments — the kernel's VPU-work proxy for ordering
    quality (cost ∝ Σ_b snum(b) · K)."""
    if a.nnz == 0:
        return 1
    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), a.row_nnz)
    b_of = rows // BLOCK
    nblk = max(_ceil(max(a.nrows, 1), BLOCK), 1)
    col_seg = (a.indices >> 7).astype(np.int64)
    lo = np.full(nblk, np.iinfo(np.int64).max)
    hi = np.zeros(nblk, dtype=np.int64)
    np.minimum.at(lo, b_of, col_seg)
    np.maximum.at(hi, b_of, col_seg)
    lo = np.minimum(lo, hi)
    return int(np.sum(hi - lo + 1))


def best_perm(a: CSR, margin: float = 0.9):
    """RCM permutation if it beats the natural ordering's window cost by
    ≥10%, else None (identity) — FEM matrices often arrive already
    bandwidth-ordered (the reference's own Cuthill–McKee renumbering,
    testcase1 main.cpp:179-194)."""
    base = window_cost(a)
    perm = rcm_perm(a)
    if window_cost(permute_sym(a, perm)) < margin * base:
        return perm
    return None


def induced_coarse_perm(p: CSR, fine_perm) -> np.ndarray:
    """Order coarse indices by the (permuted) position of their first
    fine connection in P — aligning every level's ordering with level
    0's band structure.

    Independent per-level RCM gives each level a good A band but leaves
    P/R windows unbounded (fine and coarse orderings need not align —
    measured s_max == nseg on TPU, i.e. zero window locality). The
    induced ordering keeps a fine block's coarse columns contiguous, so
    P, R AND the coarse operator all inherit level-0's bandwidth."""
    rows, cols, _ = p.row_expand()
    if fine_perm is not None:
        rank_of = np.empty(p.nrows, dtype=np.int64)
        rank_of[fine_perm] = np.arange(p.nrows)
        rows = rank_of[rows]
    pos = np.full(p.ncols, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(pos, cols, rows)
    return np.argsort(pos, kind="stable").astype(np.int64)


def permute(a: CSR, row_perm, col_perm) -> CSR:
    """A[row_perm][:, col_perm]; either may be None (identity)."""
    rows, cols, vals = a.row_expand()
    if row_perm is not None:
        ir = np.empty(a.nrows, dtype=np.int64)
        ir[row_perm] = np.arange(a.nrows)
        rows = ir[rows]
    if col_perm is not None:
        ic = np.empty(a.ncols, dtype=np.int64)
        ic[col_perm] = np.arange(a.ncols)
        cols = ic[cols]
    return CSR.from_coo(rows, cols, vals, a.shape, sum_duplicates=False)


def from_csr(a: CSR, dtype=np.float32, k_align: int = 4,
             s_granule: int = 4) -> WELL:
    """Pack a (bandwidth-ordered) CSR matrix into WELL arrays.

    k_align buckets the slot count, s_granule buckets s_max — both keep the
    jit cache stable across the per-θ shape jitter of AMG sweep hierarchies
    (hierarchy row counts vary slightly with θ; see AMGParams.shape_buckets).
    """
    data, lcol, w0, snum, s_max = _pack_host(a, dtype, k_align, s_granule)
    nblk = data.shape[0]
    k = data.shape[1]
    return WELL(
        data=jnp.asarray(data.reshape(nblk, k * 8, _LANES)),
        lcol=jnp.asarray(lcol.reshape(nblk, k * 8, _LANES)),
        w0=jnp.asarray(w0),
        snum=jnp.asarray(snum),
        nrows=a.nrows, ncols=a.ncols, nnz=a.nnz, s_max=s_max,
    )


def _pack_host(a: CSR, dtype, k_align: int, s_granule: int):
    """Host (numpy) WELL packing: (data (nblk,K,8,128), lcol, w0, snum,
    s_max)."""
    nblk = max(_ceil(max(a.nrows, 1), BLOCK), 1)
    row_nnz = a.row_nnz
    k = int(row_nnz.max()) if a.nrows and a.nnz else 1
    k = max(_ceil(max(k, 1), k_align) * k_align, k_align)

    nseg = _ceil(max(a.ncols, 1), _LANES)
    data = np.zeros((nblk, k, 8, _LANES), dtype=dtype)
    lcol = np.zeros((nblk, k, 8, _LANES), dtype=np.int32)
    w0 = np.zeros(nblk, dtype=np.int32)
    snum = np.ones(nblk, dtype=np.int32)

    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), row_nnz)
    pos = np.arange(a.nnz, dtype=np.int64) - np.repeat(a.indptr[:-1], row_nnz)
    b_of = rows // BLOCK
    # per-block window: [min_col >> 7, max_col >> 7]
    if a.nnz:
        col_seg = (a.indices >> 7).astype(np.int32)
        w0 = np.full(nblk, nseg - 1, dtype=np.int32)
        np.minimum.at(w0, b_of, col_seg)
        s_hi = np.zeros(nblk, dtype=np.int32)
        np.maximum.at(s_hi, b_of, col_seg)
        snum = np.maximum(s_hi - w0 + 1, 1)
    s_max = int(snum.max())
    s_max = max(_ceil(s_max, s_granule) * s_granule, s_granule)
    s_max = min(s_max, nseg)
    # clamp windows inside x storage, then RE-derive window lengths — a
    # clamped-down w0 widens the window its block must scan
    w0 = np.minimum(w0, max(nseg - s_max, 0)).astype(np.int32)
    if a.nnz:
        snum = np.maximum(s_hi - w0 + 1, 1).astype(np.int32)

    i_of = (rows % BLOCK) // _LANES
    l_of = rows % _LANES
    data[b_of, pos, i_of, l_of] = a.data
    lcol[b_of, pos, i_of, l_of] = a.indices - (w0[b_of] << 7)
    return data, lcol, w0, snum, s_max


def from_csr_ds(a: CSR, k_align: int = 4, s_granule: int = 4):
    """(hi WELL, lo values) — double-single (two-f32) packing of an f64
    host matrix for compensated residuals (sparse/double_single.py math)
    on the WELL kernel. The split happens on HOST numpy (jnp.asarray
    would silently downcast f64 with jax_enable_x64 off — the lo part
    would be all-zero). The lo array shares hi's slot layout."""
    d64, lcol, w0, snum, s_max = _pack_host(a, np.float64, k_align,
                                            s_granule)
    nblk, k = d64.shape[0], d64.shape[1]
    hi = d64.astype(np.float32)
    lo = (d64 - hi.astype(np.float64)).astype(np.float32)
    w_hi = WELL(
        data=jnp.asarray(hi.reshape(nblk, k * 8, _LANES)),
        lcol=jnp.asarray(lcol.reshape(nblk, k * 8, _LANES)),
        w0=jnp.asarray(w0), snum=jnp.asarray(snum),
        nrows=a.nrows, ncols=a.ncols, nnz=a.nnz, s_max=s_max)
    return w_hi, jnp.asarray(lo.reshape(nblk, k * 8, _LANES))


def residual_ds_ref(a_hi: WELL, a_lo, xh, xl, bh, bl):
    """Portable r = b − A x in double-single on the WELL layout (XLA
    gather; the oracle for the Pallas kernel). Returns (r_hi, r_lo) of
    length a.nrows (true rows)."""
    from .double_single import _tap_accumulate, ds_add

    xs_h = _x_segments(a_hi, xh).reshape(-1)
    xs_l = _x_segments(a_hi, xl).reshape(-1)
    gcol = a_hi.lcol + (a_hi.w0[:, None, None] << 7)
    gh = jnp.take(xs_h, gcol, axis=0)
    gl = jnp.take(xs_l, gcol, axis=0)
    acc_h = jnp.zeros_like(a_hi.data)
    acc_l = jnp.zeros_like(a_hi.data)
    acc_h, acc_l = _tap_accumulate(acc_h, acc_l, a_hi.data, a_lo, gh, gl)
    nblk, k8, _ = a_hi.data.shape
    # ds-reduce the K slot groups (exact pairwise two_sum accumulation)
    rh = jnp.zeros((nblk, 8, _LANES), dtype=jnp.float32)
    rl = jnp.zeros((nblk, 8, _LANES), dtype=jnp.float32)
    a4h = acc_h.reshape(nblk, k8 // 8, 8, _LANES)
    a4l = acc_l.reshape(nblk, k8 // 8, 8, _LANES)
    for kk in range(k8 // 8):
        rh, rl = ds_add(rh, rl, a4h[:, kk], a4l[:, kk])
    n = a_hi.nrows
    pad = a_hi.padded_rows

    def pad_to(v):
        v = jnp.asarray(v, dtype=jnp.float32)
        if v.shape[0] < pad:
            v = jnp.concatenate([v, jnp.zeros(pad - v.shape[0],
                                              jnp.float32)])
        return v.reshape(nblk, 8, _LANES)

    out_h, out_l = ds_add(pad_to(bh), pad_to(bl), -rh, -rl)
    return out_h.reshape(-1)[:n], out_l.reshape(-1)[:n]


def _residual_kernel_ds(w0_ref, snum_ref, xh_ref, xl_ref, dh_ref, dl_ref,
                        lcol_ref, bh_ref, bl_ref, rh_ref, rl_ref, *, k8):
    from .double_single import ds_add, two_prod

    b = pl.program_id(0)
    w0 = w0_ref[b]
    dh = dh_ref[0]
    dl = dl_ref[0]
    lcol = lcol_ref[0]
    lane = jnp.bitwise_and(lcol, _LANES - 1)
    seg = jnp.right_shift(lcol, 7)
    zero = jnp.zeros((), jnp.float32)

    def body(i, acc):
        acc_h, acc_l = acc
        s0 = i.astype(jnp.int32) * jnp.int32(4)
        for d in range(4):
            s = s0 + jnp.int32(d)
            sel = seg == s
            gh = _lane_gather(jnp.broadcast_to(xh_ref[w0 + s, :][None, :],
                                               (k8, _LANES)), lane)
            gl = _lane_gather(jnp.broadcast_to(xl_ref[w0 + s, :][None, :],
                                               (k8, _LANES)), lane)
            ah = jnp.where(sel, dh, zero)
            al = jnp.where(sel, dl, zero)
            p, perr = two_prod(ah, gh)
            tap_lo = perr + (ah * gl + al * gh + al * gl)
            acc_h, acc_l = ds_add(acc_h, acc_l, p, tap_lo)
        return acc_h, acc_l

    z = jnp.zeros((k8, _LANES), jnp.float32)
    trips = (snum_ref[b] + jnp.int32(3)) // jnp.int32(4)
    acc_h, acc_l = jax.lax.fori_loop(jnp.int32(0), trips, body, (z, z))
    rh = bh_ref[0]
    rl = bl_ref[0]
    for kk in range(k8 // 8):
        rh, rl = ds_add(rh, rl, -acc_h[kk * 8:(kk + 1) * 8],
                        -acc_l[kk * 8:(kk + 1) * 8])
    rh_ref[0] = rh
    rl_ref[0] = rl


@functools.partial(jax.jit, static_argnames=("interpret",))
def _residual_ds_pallas(a_hi: WELL, a_lo, xh, xl, bh, bl,
                        interpret: bool = False):
    xs_h = _x_segments(a_hi, xh)
    xs_l = _x_segments(a_hi, xl)
    nblk, k8, _ = a_hi.data.shape
    pad = a_hi.padded_rows

    def pad_to(v):
        v = jnp.asarray(v, dtype=jnp.float32)
        if v.shape[0] < pad:
            v = jnp.concatenate([v, jnp.zeros(pad - v.shape[0],
                                              jnp.float32)])
        return v.reshape(nblk, 8, _LANES)

    kern = functools.partial(_residual_kernel_ds, k8=k8)
    blk3 = lambda: pl.BlockSpec((1, k8, _LANES),
                                lambda b: (b, b * 0, b * 0))
    blk8 = lambda: pl.BlockSpec((1, 8, _LANES), lambda b: (b, b * 0, b * 0))
    rh, rl = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk,), lambda b: (b * 0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nblk,), lambda b: (b * 0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(xs_h.shape, lambda b: (b * 0, b * 0)),
            pl.BlockSpec(xs_h.shape, lambda b: (b * 0, b * 0)),
            blk3(), blk3(), blk3(), blk8(), blk8(),
        ],
        out_specs=(blk8(), blk8()),
        out_shape=(jax.ShapeDtypeStruct((nblk, 8, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nblk, 8, _LANES), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a_hi.w0, a_hi.snum, xs_h, xs_l, a_hi.data, a_lo, a_hi.lcol,
      pad_to(bh), pad_to(bl))
    n = a_hi.nrows
    return rh.reshape(-1)[:n], rl.reshape(-1)[:n]


def residual_ds(a_hi: WELL, a_lo, xh, xl, bh, bl, interpret: bool = False):
    """r = b − A x in double-single via the WELL kernel on TPU (XLA
    reference elsewhere) — the unstructured ir_solve outer residual
    (the emulated-f64 ELL gather it replaces cost ~150 ms per outer
    iteration at 36k DoFs)."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if (on_tpu or interpret) and fits_vmem(a_hi):
        return _residual_ds_pallas(a_hi, a_lo, xh, xl, bh, bl,
                                   interpret=interpret and not on_tpu)
    return residual_ds_ref(a_hi, a_lo, xh, xl, bh, bl)


def to_csr(a: WELL) -> CSR:
    """Unpack back to host CSR (drops padding slots; test utility)."""
    nblk, k8, _ = a.data.shape
    k = k8 // 8
    data = np.asarray(a.data).reshape(nblk, k, 8, _LANES)
    lcol = np.asarray(a.lcol).reshape(nblk, k, 8, _LANES)
    w0 = np.asarray(a.w0)
    b, kk, i, l = np.nonzero(data)
    rows = b * BLOCK + i * _LANES + l
    cols = lcol[b, kk, i, l] + (w0[b] << 7)
    keep = rows < a.nrows
    return CSR.from_coo(rows[keep], cols[keep], data[b, kk, i, l][keep],
                        (a.nrows, a.ncols))


def _x_segments(a: WELL, x: jax.Array) -> jax.Array:
    """x as (nseg, 128), padded/sliced to the matrix's column storage."""
    need = a.nseg * _LANES
    n = x.shape[0]
    if n < need:
        x = jnp.concatenate([x, jnp.zeros(need - n, dtype=x.dtype)])
    elif n > need:
        x = x[:need]
    return x.reshape(a.nseg, _LANES)


def spmv_ref(a: WELL, x: jax.Array) -> jax.Array:
    """Portable (XLA gather) y = A @ x — identical math to the kernel.

    y has a.padded_rows entries (zeros beyond a.nrows)."""
    xs = _x_segments(a, x).reshape(-1)
    gcol = a.lcol + (a.w0[:, None, None] << 7)
    prod = a.data * jnp.take(xs, gcol, axis=0)
    nblk, k8, _ = a.data.shape
    y = jnp.sum(prod.reshape(nblk, k8 // 8, 8, _LANES), axis=1)
    return y.reshape(-1)


_GATHER_DNUMS = None


def _lane_gather(src, lane):
    """take_along_axis(src, lane, axis=1) with int32 indices.

    jnp.take_along_axis upcasts indices to int64 under jax_enable_x64,
    which Mosaic rejects; this builds the identical lax.gather (the form
    Mosaic lowers to tpu.dynamic_gather along lanes) directly. Indices
    are in [0, 128) by construction ⇒ PROMISE_IN_BOUNDS."""
    global _GATHER_DNUMS
    if _GATHER_DNUMS is None:
        _GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        src, lane[..., None], _GATHER_DNUMS, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _spmv_kernel(w0_ref, snum_ref, x_ref, data_ref, lcol_ref, y_ref, *, k8):
    b = pl.program_id(0)
    w0 = w0_ref[b]
    data = data_ref[0]                       # (K*8, 128)
    lcol = lcol_ref[0]
    lane = jnp.bitwise_and(lcol, _LANES - 1)
    seg = jnp.right_shift(lcol, 7)

    zero = jnp.zeros((), data.dtype)

    def body(i, acc):
        # pin the loop index to int32 — under jax_enable_x64 the induction
        # variable would otherwise trace as int64, which Mosaic rejects.
        # Unrolled ×4: the scalar-loop trip overhead (~0.3 µs) dominated
        # the measured SpMV at 36k DoFs; s_granule=4 in from_csr
        # guarantees w0 + roundup(snum,4) ≤ nseg, so the overshoot reads
        # stay inside x and their seg==s selects are all-false.
        s0 = i.astype(jnp.int32) * jnp.int32(4)
        for d in range(4):
            s = s0 + jnp.int32(d)
            xrow = x_ref[w0 + s, :]                          # (128,)
            src = jnp.broadcast_to(xrow[None, :], (k8, _LANES))
            g = _lane_gather(src, lane)
            # concrete f32 zero: a Python 0.0 literal is weak-f64 under
            # jax_enable_x64 (f64→f32 cast, which Mosaic rejects)
            acc = acc + jnp.where(seg == s, data * g, zero)
        return acc

    # all-jnp.int32 scalar arithmetic: mixing Python ints recurses
    # Mosaic's x64 convert helper (same fix as sparse/pallas_spmv.py)
    trips = (snum_ref[b] + jnp.int32(3)) // jnp.int32(4)
    acc = jax.lax.fori_loop(jnp.int32(0), trips,
                            body, jnp.zeros((k8, _LANES), data.dtype))
    y_ref[0] = jnp.sum(acc.reshape(k8 // 8, 8, _LANES), axis=0)


try:  # import guard keeps CPU-only environments importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_pallas(a: WELL, x: jax.Array, interpret: bool = False):
    xs = _x_segments(a, x)
    nblk, k8, _ = a.data.shape
    kern = functools.partial(_spmv_kernel, k8=k8)
    y = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            # every index map is written in terms of b (b*0, not literal
            # 0): under jax_enable_x64 literal map results trace as i64,
            # which Mosaic refuses to return from the map function
            pl.BlockSpec((nblk,), lambda b: (b * 0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nblk,), lambda b: (b * 0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(xs.shape, lambda b: (b * 0, b * 0)),
            pl.BlockSpec((1, k8, _LANES), lambda b: (b, b * 0, b * 0)),
            pl.BlockSpec((1, k8, _LANES), lambda b: (b, b * 0, b * 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, _LANES), lambda b: (b, b * 0, b * 0)),
        out_shape=jax.ShapeDtypeStruct((nblk, 8, _LANES), a.data.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a.w0, a.snum, xs, a.data, a.lcol)
    return y.reshape(-1)


def fits_vmem(a: WELL) -> bool:
    """True when x + the slot blocks fit the kernel's VMEM budget."""
    x_bytes = a.nseg * _LANES * 4
    blk_bytes = 2 * 2 * a.data.shape[1] * _LANES * 4   # data+lcol, 2-stage
    return _HAVE_PALLAS and (x_bytes + blk_bytes) <= X_VMEM_BYTES


def spmv(a: WELL, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x, dispatched: Pallas kernel on TPU backends (or in
    interpret mode for tests), XLA-gather reference elsewhere."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if (on_tpu or interpret) and fits_vmem(a) \
            and a.data.dtype == jnp.float32:
        return _spmv_pallas(a, x, interpret=interpret and not on_tpu)
    return spmv_ref(a, x)


# ---------------------------------------------------------------------------
# Fused whole-smoother-application kernel (r5, VERDICT item 8)
#
# The 36k-DoF unstructured solve is op-LAUNCH bound: each Chebyshev step
# cost one Pallas SpMV launch + XLA elementwise ops, ~25-30 launches per
# PCG iteration across the hierarchy. When the whole level fits in VMEM
# (matrix blocks + ~7 vectors), the COMPLETE smoother application — the
# initial residual, every recurrence step, and the optional output
# residual — runs as ONE kernel: the matvec loops over the row blocks
# in-kernel, reading the iterate from a VMEM scratch buffer.
# ---------------------------------------------------------------------------

def _fused_matvec(v_scr, t_scr, w0_ref, snum_ref, data_ref, lcol_ref,
                  nblk: int, k8: int):
    """t_scr ← A · v_scr (both (nsegS, 128) VMEM scratch refs)."""
    zero = jnp.zeros((), data_ref.dtype)
    for bb in range(nblk):                     # static unroll over blocks
        data = data_ref[bb]
        lcol = lcol_ref[bb]
        lane = jnp.bitwise_and(lcol, _LANES - 1)
        seg = jnp.right_shift(lcol, 7)
        w0 = w0_ref[bb]

        def body(i, acc):
            s0 = i.astype(jnp.int32) * jnp.int32(4)
            for d in range(4):
                s = s0 + jnp.int32(d)
                xrow = v_scr[w0 + s, :]
                src = jnp.broadcast_to(xrow[None, :], (k8, _LANES))
                g = _lane_gather(src, lane)
                acc = acc + jnp.where(seg == s, data * g, zero)
            return acc

        trips = (snum_ref[bb] + jnp.int32(3)) // jnp.int32(4)
        acc = jax.lax.fori_loop(jnp.int32(0), trips, body,
                                jnp.zeros((k8, _LANES), data_ref.dtype))
        t_scr[bb * 8:(bb + 1) * 8, :] = jnp.sum(
            acc.reshape(k8 // 8, 8, _LANES), axis=0)


def _smooth_apply_kernel(w0_ref, snum_ref, coefs_ref, x_ref, b_ref, s_ref,
                         data_ref, lcol_ref, xo_ref, ro_ref,
                         d_scr, t_scr, *, k8, nblk, steps, x_zero,
                         want_res):
    """op_smooth_apply semantics (solvers/ops.py:97-117) in one launch."""
    sv = s_ref[...]
    bv = b_ref[...]
    if x_zero:
        x = jnp.zeros_like(bv)
        r = bv
    else:
        x = x_ref[...]
        d_scr[...] = x
        _fused_matvec(d_scr, t_scr, w0_ref, snum_ref, data_ref, lcol_ref,
                      nblk, k8)
        r = bv - t_scr[...]
    d = coefs_ref[0, 0] * (sv * r)
    for j in range(1, steps):
        d_scr[...] = d
        _fused_matvec(d_scr, t_scr, w0_ref, snum_ref, data_ref, lcol_ref,
                      nblk, k8)
        x = x + d
        r = r - t_scr[...]
        d = coefs_ref[j, 0] * d + coefs_ref[j, 1] * (sv * r)
    if want_res:
        d_scr[...] = d
        _fused_matvec(d_scr, t_scr, w0_ref, snum_ref, data_ref, lcol_ref,
                      nblk, k8)
        xo_ref[...] = x + d
        ro_ref[...] = r - t_scr[...]
    else:
        xo_ref[...] = x + d
        ro_ref[...] = r


def _nseg_state(a: WELL) -> int:
    """State-vector segments: covers both row padding and col storage."""
    return max(a.nseg, a.padded_rows // _LANES)


def fits_vmem_fused(a: WELL) -> bool:
    """VMEM budget for the fused smoother: blocks + 2 scratches + ~5
    state vectors (b/s/x in, x/r out) resident at once."""
    nseg_s = _nseg_state(a)
    vec = nseg_s * _LANES * 4
    blk = 2 * a.data.shape[0] * a.data.shape[1] * _LANES * 4  # data+lcol
    return _HAVE_PALLAS and (blk + 7 * vec) <= 48 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("x_zero", "want_res", "interpret"))
def _smooth_apply_pallas(a: WELL, x, b, s, coefs, x_zero: bool,
                         want_res: bool, interpret: bool = False):
    nseg_s = _nseg_state(a)

    def pad(v):
        need = nseg_s * _LANES
        n = v.shape[0]
        if n < need:
            v = jnp.concatenate([v, jnp.zeros(need - n, dtype=v.dtype)])
        return v[:need].reshape(nseg_s, _LANES)

    nblk, k8, _ = a.data.shape
    steps = int(coefs.shape[0])
    kern = functools.partial(_smooth_apply_kernel, k8=k8, nblk=nblk,
                             steps=steps, x_zero=x_zero,
                             want_res=want_res)
    vec_spec = pl.BlockSpec((nseg_s, _LANES), lambda g: (g * 0, g * 0))
    xo, ro = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((nblk,), lambda g: (g * 0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nblk,), lambda g: (g * 0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(coefs.shape, lambda g: (g * 0, g * 0),
                         memory_space=pltpu.SMEM),
            vec_spec, vec_spec, vec_spec,
            pl.BlockSpec((nblk, k8, _LANES),
                         lambda g: (g * 0, g * 0, g * 0)),
            pl.BlockSpec((nblk, k8, _LANES),
                         lambda g: (g * 0, g * 0, g * 0)),
        ],
        out_specs=[vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct((nseg_s, _LANES), a.data.dtype),
                   jax.ShapeDtypeStruct((nseg_s, _LANES), a.data.dtype)],
        scratch_shapes=[pltpu.VMEM((nseg_s, _LANES), a.data.dtype),
                        pltpu.VMEM((nseg_s, _LANES), a.data.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a.w0, a.snum, coefs.astype(a.data.dtype), pad(x), pad(b), pad(s),
      a.data, a.lcol)
    npad = a.padded_rows
    return xo.reshape(-1)[:npad], ro.reshape(-1)[:npad]


def smooth_apply(a: WELL, x, b, s, coefs, x_zero: bool, want_res: bool,
                 interpret: bool = False):
    """Fused smoother application (one launch) when the level fits VMEM;
    returns (x', r' or None). Callers must pre-check fits_vmem_fused."""
    xo, ro = _smooth_apply_pallas(a, x, b, s, coefs, x_zero, want_res,
                                  interpret)
    return xo, (ro if want_res else None)
