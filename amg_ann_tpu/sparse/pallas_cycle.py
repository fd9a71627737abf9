"""Fused coarse-tail V-cycle — ONE Pallas launch for every level below
the fine grid.

Motivation (round-2 measurement): the 64³ structured solve is op-LATENCY
bound — the fine level is a handful of fused kernels streaming from HBM,
but the coarse tail (32³/16³/8³) still issues ~20-30 separate XLA/Pallas
ops per PCG iteration, each mostly fixed overhead at those sizes. The
whole tail's data (operators, transfer bands, dense coarse inverse) is a
few MB — it fits in VMEM. So this kernel runs the COMPLETE sub-V-cycle
below a chosen level l0 — pre-smoothing, weighted restriction, recursion,
dense coarsest solve, prolongation-correction, post-smoothing — in one
launch with zero HBM round-trips between steps.

Replaces (for levels ≥ l0) the per-op path of solvers/cycle._cycle, which
itself replaces hypre's BoomerAMG V-cycle inside PETSc CG (reference:
code/data-generation/common/amg_solver.h:53-56). Semantics are pinned
against _cycle by tests/test_fused_tail.py.

Design notes
------------
* All operands ride full-array VMEM BlockSpecs (no grid, no manual DMA):
  the tail is built only when its footprint fits a VMEM budget.
* Stencil application = value shifts: y[i] = Σ_k band_k[i] · v[i + o_k]
  on the (R, 128) layout, with shift(v, o) decomposed into a sublane
  (row) shift and a lane shift, realized as zero-filled concatenations of
  VALUES (nothing wraps; out-of-matrix taps carry zero coefficients — the
  DIA contract of sparse/dia.py).
* Restriction reuses the PROLONGATION bands (adjoint): c = subsample(y),
  y[i] = Σ_o (band_o ⊙ r)[i − o] — no r_dia storage in VMEM.
* subsample / interleave across levels are index gathers in the flat
  (R, 128) layout. They are NOT lane-stride-expressible, so each is
  decomposed host-side into a small sum of selection-matmul terms

      dst = Σ_t  L_t @ src @ S_t,   L_t, S_t one-hot (0/1)

  (`_selection_terms`). The one-hot factors are rebuilt in-kernel from
  int index vectors with broadcasted_iota comparisons (VMEM holds i32
  indices, not 128×128 f32 matrices); the matmuls land on the MXU.
* The coarsest dense solve is the precomputed inverse applied as 128×128
  blocked matmuls: y_blk[ri] = Σ_rj x_blk[rj] @ Q[rj, ri] with
  Q[rj, ri] = INV[ri·128:(ri+1)·128, rj·128:(rj+1)·128]ᵀ.
* Chebyshev/Jacobi/ℓ1-Jacobi all share the residual-carrying recurrence
  of solvers/smoothers.py; per-level coefficients (functions of the
  traced λ_max) arrive as one (F, n_rows, 2) SMEM array, so the kernel
  and the jit cache stay θ-independent (hierarchy-shape invariants of
  the device setup are preserved).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Input-footprint budget for the fused tail (bytes of VMEM-resident
# operands). ~16 MB VMEM/core minus working values and double buffers.
VMEM_CAP = int(os.environ.get("AMG_FUSED_TAIL_VMEM", str(10 * 1024 * 1024)))
# Max selection-matmul terms per transfer direction per level; maps that
# decompose worse than this (odd, non-2^k grids) fall back to the
# unfused path.
MAX_TERMS = 16


# --------------------------------------------------------------------------
# host-side: selection-term decomposition of flat index maps
# --------------------------------------------------------------------------
def _selection_terms(dst_idx, src_idx, dst_rows, src_rows,
                     max_terms=MAX_TERMS):
    """Decompose the map dst[dst_idx[j]] = src[src_idx[j]] on (R, 128)
    layouts into terms (rsrc, lsrc):

        dst = Σ_t  onehot_rows(rsrc_t) @ src @ onehot_lanes(lsrc_t)

    rsrc_t: (dst_rows,) i32, source row per dst row (−1 = dead row);
    lsrc_t: (LANES,) i32, source lane per dst lane (−1 = dead lane).

    A term is valid iff all its (dst row, dst lane) cells are either
    genuine map entries or produce zero (dead row/lane), so terms are
    keyed by their exact (row-set, row-map): every lane column attached
    to a key covers exactly that row set. Returns None if more than
    `max_terms` terms are needed (caller falls back to unfused).
    """
    dst_idx = np.asarray(dst_idx, dtype=np.int64)
    src_idx = np.asarray(src_idx, dtype=np.int64)
    rd, ld = np.divmod(dst_idx, LANES)
    rs, ls = np.divmod(src_idx, LANES)
    terms = {}
    # group map entries by (dst lane, src lane): each such piece has a
    # row set + row map that must live inside a single term
    order = np.lexsort((rd, ls, ld))
    rd, ld, rs, ls = rd[order], ld[order], rs[order], ls[order]
    bounds = np.flatnonzero(np.diff(ld * LANES + ls)) + 1
    for chunk in np.split(np.arange(rd.size), bounds):
        key = (rd[chunk].tobytes(), rs[chunk].tobytes())
        t = terms.get(key)
        if t is None:
            if len(terms) >= max_terms:
                return None
            t = (np.full(dst_rows, -1, np.int32), np.full(LANES, -1,
                                                          np.int32))
            t[0][rd[chunk]] = rs[chunk]
            terms[key] = t
        t[1][ld[chunk[0]]] = ls[chunk[0]]
    return list(terms.values())


def _coarse_pos_map(fine_shape, strides):
    """Flat fine index of each coarse point (2J+1 per stride-2 axis, J on
    stride-1 axes) — the subsample_flat / interleave_flat map
    (amg/transfer.py)."""
    axes = [np.arange(s // 2) * 2 + 1 if st == 2 else np.arange(s)
            for s, st in zip(fine_shape, strides)]
    nx, ny, nz = fine_shape
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    return ((gx * ny + gy) * nz + gz).reshape(-1)


@functools.lru_cache(maxsize=256)
def _transfer_terms(shape, strides, r_next, r_l):
    """(sub_terms, interleave_terms) for one level's coarse map — pure
    function of static geometry, lru-cached so every per-θ setup of a
    sweep reuses the host-side decomposition (it cost ~100 ms of numpy
    per setup call before caching)."""
    fmap = _coarse_pos_map(shape, strides)
    sub = _selection_terms(np.arange(fmap.size), fmap, r_next, r_l)
    intl = _selection_terms(fmap, np.arange(fmap.size), r_l, r_next)
    return sub, intl


# --------------------------------------------------------------------------
# plan
# --------------------------------------------------------------------------
@struct.dataclass
class FusedTail:
    """Device operands + static geometry for the fused tail kernel.

    Per fused smoothing level l (index 0 = hierarchy level l0):
    a_data/p_data (K, R, 128) bands, sdiag (R, 128) smoother scale,
    rsub/lsub (T, rows/LANES) i32 restriction selectors into the next
    level's layout, rint/lint the interleave selectors back. coefs holds
    the per-level smoother recurrence rows; inv_q the blocked coarsest
    inverse."""

    a_data: tuple
    p_data: tuple
    sdiag: tuple
    rsub: tuple
    lsub: tuple
    rint: tuple
    lint: tuple
    inv_q: jax.Array
    coefs: jax.Array
    l0: int = struct.field(pytree_node=False)
    offs_a: tuple = struct.field(pytree_node=False)
    offs_p: tuple = struct.field(pytree_node=False)
    rows: tuple = struct.field(pytree_node=False)    # R per fused level
    rows_c: int = struct.field(pytree_node=False)    # coarsest R
    n0: int = struct.field(pytree_node=False)        # true dofs at l0
    n_pre: int = struct.field(pytree_node=False)
    n_post: int = struct.field(pytree_node=False)


def _smoother_rows(lev, params):
    """(n_rows, 2) recurrence coefficients for one smoother application —
    the shared op_smooth_apply row format (solvers/smoothers.py)."""
    from ..solvers.smoothers import smoother_coef_rows

    return smoother_coef_rows(lev, params)


def _pad2d(v, rows):
    """Flat (n,) → (rows, 128) zero-padded."""
    rc = rows * LANES
    if v.shape[0] != rc:
        v = jnp.pad(v, (0, rc - v.shape[0]))
    return v.reshape(rows, LANES)


def build_fused_tail(levels, coarse_inv, params, vmem_cap=None):
    """Build the fused-tail plan for a structured hierarchy, or None.

    Picks the smallest l0 ≥ 0 whose tail operands fit the VMEM budget
    and whose transfer maps decompose into ≤ MAX_TERMS selection terms —
    l0 = 0 means the ENTIRE V-cycle preconditioner is one Pallas launch
    (small problems, ≲32³; the footprint check keeps bigger fine levels
    on the per-op path). Requires: V-cycle, operator-induced weights
    (p_w) on every fused level, f32 data, scalar StructuredLevel tail.
    """
    from ..amg.structured_mg import StructuredLevel
    from ..amg.transfer import transfer_dia

    if params.cycle_type != "V":
        return None
    if params.smoother not in ("chebyshev", "jacobi", "l1jacobi"):
        return None
    L = len(levels)
    if L < 2:
        return None
    for lev in levels:
        if not isinstance(lev, StructuredLevel):
            return None
        if lev.a.data.dtype != jnp.float32 or lev.a.cols != LANES:
            return None
    if any(lev.p_w is None for lev in levels[:-1]):
        return None  # trilinear path carries no weight stencils

    cap = VMEM_CAP if vmem_cap is None else vmem_cap
    n_last = levels[-1].a.n
    rows_c = -(-n_last // LANES)
    inv_bytes = rows_c * rows_c * LANES * LANES * 4

    for l0 in range(0, L - 1):
        tail = levels[l0:]
        footprint = inv_bytes + 6 * tail[0].a.data.shape[1] * LANES * 4
        for lev in tail[:-1]:
            kr = lev.a.data.shape
            footprint += 2 * kr[0] * kr[1] * LANES * 4  # a + p bands
            footprint += kr[1] * LANES * 4              # sdiag
        if footprint > cap:
            continue

        a_data, p_data, sdiag, coefs = [], [], [], []
        rsub, lsub, rint, lint = [], [], [], []
        offs_a, offs_p, rows = [], [], []
        ok = True
        for i, lev in enumerate(tail[:-1]):
            r_l = lev.a.data.shape[1]
            nxt = tail[i + 1]
            r_next = (nxt.a.data.shape[1] if i + 1 < len(tail) - 1
                      else rows_c)
            sub, intl = _transfer_terms(tuple(lev.shape),
                                        tuple(lev.strides),
                                        int(r_next), int(r_l))
            if sub is None or intl is None:
                ok = False
                break
            if lev.p_dia is not None:
                p = lev.p_dia
            else:
                p, _ = transfer_dia(lev.p_w, lev.shape, lev.strides)
            if p.data.shape[1] != r_l:
                ok = False  # transfer bands padded differently than A
                break
            s_vec = (lev.inv_l1 if params.smoother == "l1jacobi"
                     else lev.inv_diag)
            a_data.append(lev.a.data)
            p_data.append(p.data)
            sdiag.append(_pad2d(s_vec, r_l))
            coefs.append(_smoother_rows(lev, params))
            offs_a.append(lev.a.offsets)
            offs_p.append(p.offsets)
            rows.append(r_l)
            # (T, R, 1) / (T, 1, LANES): 2-D slices inside the kernel
            # (Mosaic has no 1-D vectors)
            rsub.append(jnp.asarray(
                np.stack([t[0] for t in sub])[:, :, None]))
            lsub.append(jnp.asarray(
                np.stack([t[1] for t in sub])[:, None, :]))
            rint.append(jnp.asarray(
                np.stack([t[0] for t in intl])[:, :, None]))
            lint.append(jnp.asarray(
                np.stack([t[1] for t in intl])[:, None, :]))
        if not ok:
            continue

        nc_pad = rows_c * LANES
        inv = coarse_inv.astype(jnp.float32)
        if inv.shape[0] != nc_pad:
            inv = jnp.pad(inv, ((0, nc_pad - inv.shape[0]),) * 2)
        # Q[rj, ri][l, l'] = INV[ri·128 + l', rj·128 + l]
        inv_q = inv.reshape(rows_c, LANES, rows_c, LANES).transpose(
            2, 0, 3, 1)

        return FusedTail(
            a_data=tuple(a_data), p_data=tuple(p_data),
            sdiag=tuple(sdiag),
            rsub=tuple(rsub), lsub=tuple(lsub),
            rint=tuple(rint), lint=tuple(lint),
            inv_q=inv_q, coefs=jnp.stack(coefs),
            l0=l0, offs_a=tuple(offs_a), offs_p=tuple(offs_p),
            rows=tuple(rows), rows_c=rows_c, n0=tail[0].a.n,
            n_pre=params.n_pre_smooth, n_post=params.n_post_smooth,
        )
    return None


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------
def _shift_val(v, o: int):
    """y[i] = flat(v)[i + o] on the (R, 128) layout, zero-filled (the
    in-VMEM value analog of sparse/dia._rolled, without wrap)."""
    r, s = divmod(int(o), LANES)

    def rows(k):
        if k == 0:
            return v
        z = jnp.zeros((abs(k), LANES), v.dtype)
        if k > 0:
            return jnp.concatenate([v[k:], z], axis=0)
        return jnp.concatenate([z, v[:k]], axis=0)

    if s == 0:
        return rows(r)
    a = rows(r)
    b = rows(r + 1)
    return jnp.concatenate([a[:, s:], b[:, :s]], axis=1)


def _tail_kernel(meta, *refs):
    (f, offs_a, offs_p, rows, rows_c, n_rows_sm, n_pre, n_post,
     n_terms_sub, n_terms_int) = meta
    it = iter(refs)
    b_ref = next(it)
    a_refs = [next(it) for _ in range(f)]
    p_refs = [next(it) for _ in range(f)]
    s_refs = [next(it) for _ in range(f)]
    rsub = [next(it) for _ in range(f)]
    lsub = [next(it) for _ in range(f)]
    rint = [next(it) for _ in range(f)]
    lint = [next(it) for _ in range(f)]
    inv_ref = next(it)
    coef_ref = next(it)
    x_ref = next(it)

    def amat(l, v):
        acc = jnp.zeros_like(v)
        for k, o in enumerate(offs_a[l]):
            acc = acc + a_refs[l][k] * _shift_val(v, o)
        return acc

    def smooth(l, x, r, b, want_res):
        s = s_refs[l][:, :]
        if r is None:
            r = b - amat(l, x)
        d = coef_ref[l, 0, 0] * (s * r)
        for j in range(1, n_rows_sm):
            t = amat(l, d)
            x = x + d
            r = r - t
            d = coef_ref[l, j, 0] * d + coef_ref[l, j, 1] * (s * r)
        if want_res:
            t = amat(l, d)
            return x + d, r - t
        return x + d, None

    def select(v, r_idx_ref, l_idx_ref, t, dst_rows):
        src_rows = v.shape[0]
        lmat = (jax.lax.broadcasted_iota(
            jnp.int32, (dst_rows, src_rows), 1)
            == r_idx_ref[t, :, :]).astype(v.dtype)
        smat = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                == l_idx_ref[t, :, :]).astype(v.dtype)
        picked = jnp.dot(lmat, v, preferred_element_type=v.dtype)
        return jnp.dot(picked, smat, preferred_element_type=v.dtype)

    def coarse_solve(bc):
        out_rows = []
        for ri in range(rows_c):
            acc = jnp.zeros((1, LANES), dtype=bc.dtype)
            for rj in range(rows_c):
                acc = acc + jnp.dot(bc[rj:rj + 1, :], inv_ref[rj, ri],
                                    preferred_element_type=bc.dtype)
            out_rows.append(acc)
        return jnp.concatenate(out_rows, axis=0)

    def cycle(l, b):
        if l == f:
            return coarse_solve(b)
        x = jnp.zeros_like(b)
        r = b
        for _ in range(n_pre):
            x, r = smooth(l, x, r, b, want_res=True)
        # restriction: adjoint of the P bands, then subsample
        w = jnp.zeros_like(r)
        for k, o in enumerate(offs_p[l]):
            w = w + _shift_val(p_refs[l][k] * r, -o)
        r_next = rows[l + 1] if l + 1 < f else rows_c
        bc = jnp.zeros((r_next, LANES), dtype=b.dtype)
        for t in range(n_terms_sub[l]):
            bc = bc + select(w, rsub[l], lsub[l], t, r_next)
        xc = cycle(l + 1, bc)
        # prolongation: interleave, then P bands
        femb = jnp.zeros_like(b)
        for t in range(n_terms_int[l]):
            femb = femb + select(xc, rint[l], lint[l], t, rows[l])
        for k, o in enumerate(offs_p[l]):
            x = x + p_refs[l][k] * _shift_val(femb, o)
        for _ in range(n_post):
            x, _ = smooth(l, x, None, b, want_res=False)
        return x

    x_ref[:, :] = cycle(0, b_ref[:, :])


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _tail_call(meta, arrays, interpret=False):
    f = meta[0]
    rows0 = meta[3][0]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # b + 7 per-level operand groups + inv_q (coefs rides SMEM)
    n_in = 1 + 7 * f + 1
    total_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in arrays)
    return pl.pallas_call(
        functools.partial(_tail_kernel, meta),
        in_specs=[vspec] * n_in + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows0, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * total_bytes + 32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*arrays)


def tail_cycle(ft: FusedTail, b, interpret: bool = False):
    """Apply the fused sub-V-cycle below level ft.l0: x = M⁻¹_tail b.

    b: flat (n0,) f32. Returns flat (n0,)."""
    f = len(ft.a_data)
    meta = (f, ft.offs_a, ft.offs_p, ft.rows, ft.rows_c,
            int(ft.coefs.shape[1]), ft.n_pre, ft.n_post,
            tuple(int(r.shape[0]) for r in ft.rsub),
            tuple(int(r.shape[0]) for r in ft.rint))
    arrays = ((_pad2d(b, ft.rows[0]),) + ft.a_data + ft.p_data + ft.sdiag
              + ft.rsub + ft.lsub + ft.rint + ft.lint
              + (ft.inv_q, ft.coefs))
    x = _tail_call(meta, arrays, interpret=interpret)
    x = x.reshape(-1)
    return x[:ft.n0] if ft.n0 != x.shape[0] else x
