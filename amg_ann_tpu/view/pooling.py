"""Pooling operator: compress a sparse matrix into a multi-channel image.

Exact behavioral port of the reference's ViewMaker
(common/view_maker.h:41-74), which is the ANN's input featurizer:

  * balanced binning of n rows/cols into view_size bins: with q = n // vs,
    p = n % vs, t = (q+1)·p, the first p bins get q+1 indices, the rest q:
        bin(i) = i // (q+1)            if i < t
               = (i - t) // q + p      otherwise
  * per (bin_row, bin_col) cell, over all STORED entries (i, j, v):
        view       += v
        view_count += 1
        view_max_pp = max(view_max_pp, max(v, 0))
        view_max_np = max(view_max_np, max(-v, 0))

Stored explicit zeros count toward `view_count` exactly as in PETSc's
MatGetRow iteration, so the device path carries the true per-row entry
counts alongside the padded ELL arrays.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.csr import CSR
from ..sparse.ell import ELL


class View(NamedTuple):
    """The 4 channels, each (view_size, view_size), row-major bins."""

    sum: np.ndarray | jax.Array
    count: np.ndarray | jax.Array
    max_pp: np.ndarray | jax.Array
    max_np: np.ndarray | jax.Array

    @property
    def view_size(self):
        return self.sum.shape[0]

    def stack(self, channels=("sum", "count", "max_pp", "max_np")):
        """(view_size, view_size, C) image for the ANN."""
        xp = jnp if isinstance(self.sum, jax.Array) else np
        return xp.stack([getattr(self, c) for c in channels], axis=-1)


def bin_index(i, n: int, view_size: int):
    """Balanced bin id of row/col index i (vectorized, host or device)."""
    q = n // view_size
    p = n % view_size
    t = (q + 1) * p
    return jnp.where(i < t, i // (q + 1), (i - t) // q + p) if isinstance(
        i, jax.Array) else np.where(i < t, i // (q + 1), (i - t) // q + p)


def make_view_host(a: CSR, view_size: int) -> View:
    """Host (numpy) pooling over all stored CSR entries."""
    n = a.nrows
    rows, cols, vals = a.row_expand()
    br = bin_index(rows, n, view_size)
    bc = bin_index(cols, n, view_size)
    flat = br * view_size + bc
    nb = view_size * view_size

    v_sum = np.zeros(nb, dtype=vals.dtype)
    np.add.at(v_sum, flat, vals)
    v_cnt = np.zeros(nb, dtype=np.int64)
    np.add.at(v_cnt, flat, 1)
    v_pp = np.zeros(nb, dtype=vals.dtype)
    np.maximum.at(v_pp, flat, np.maximum(vals, 0.0))
    v_np = np.zeros(nb, dtype=vals.dtype)
    np.maximum.at(v_np, flat, np.maximum(-vals, 0.0))

    shape = (view_size, view_size)
    return View(v_sum.reshape(shape), v_cnt.reshape(shape),
                v_pp.reshape(shape), v_np.reshape(shape))


@functools.partial(jax.jit, static_argnames=("view_size", "nrows", "ncols"))
def _make_view_device(data, cols, row_nnz, view_size: int, nrows: int,
                      ncols: int):
    k = data.shape[1]
    row_ids = jnp.arange(data.shape[0], dtype=jnp.int32)[:, None]
    valid = jnp.arange(k, dtype=jnp.int32)[None, :] < row_nnz[:, None]

    br = bin_index(jnp.broadcast_to(row_ids, data.shape), nrows, view_size)
    bc = bin_index(cols, ncols, view_size)
    flat = (br * view_size + bc).reshape(-1)
    flat = jnp.where(valid.reshape(-1), flat, view_size * view_size)
    nb = view_size * view_size

    vals = jnp.where(valid, data, 0.0).reshape(-1)
    # one extra slot absorbs padding entries; sliced off below
    v_sum = jnp.zeros(nb + 1, dtype=data.dtype).at[flat].add(vals)
    v_cnt = jnp.zeros(nb + 1, dtype=jnp.int32).at[flat].add(
        valid.reshape(-1).astype(jnp.int32))
    v_pp = jnp.zeros(nb + 1, dtype=data.dtype).at[flat].max(
        jnp.maximum(vals, 0.0))
    v_np = jnp.zeros(nb + 1, dtype=data.dtype).at[flat].max(
        jnp.maximum(-vals, 0.0))

    shape = (view_size, view_size)
    return (v_sum[:nb].reshape(shape), v_cnt[:nb].reshape(shape),
            v_pp[:nb].reshape(shape), v_np[:nb].reshape(shape))


def make_view_device(a: ELL, row_nnz, view_size: int) -> View:
    """Device (jit) pooling: ELL arrays + true per-row stored-entry counts.

    Padding slots carry value 0, which is neutral for sum/max channels; the
    row_nnz mask keeps them out of `count`.
    """
    s, c, pp, np_ = _make_view_device(
        a.data, a.cols, jnp.asarray(row_nnz, dtype=jnp.int32),
        view_size, a.nrows, a.ncols)
    return View(s, c, pp, np_)


@functools.lru_cache(maxsize=64)
def _slot_pieces(n: int, view_size: int, off: int):
    """Static piece table for one stencil slot (host, cached).

    Entries of slot `off` are (i, i+off); the row bin br(i) partitions
    [0, n) into view_size contiguous ranges, and within one row bin the
    col bin bc(clip(i+off)) is monotone; since the in-bin window is at
    most q+1 long and every col bin is at least q wide, the window
    crosses at most 2 bin edges REGARDLESS of |off| — each row bin
    splits into P ≤ 3 contiguous PIECES, each mapped to one static
    (row_bin, col_bin) output cell. Returns (starts, ends, colid),
    each (view_size, P) int32 in LOCAL in-bin coordinates
    (l = i - row_start), padded with empty pieces."""
    assert n >= view_size, (n, view_size)
    q, p = divmod(n, view_size)
    row_start = np.minimum(np.arange(view_size), p) * (q + 1) + \
        np.maximum(np.arange(view_size) - p, 0) * q
    row_len = np.where(np.arange(view_size) < p, q + 1, q)

    def bc(j):
        j = min(max(j, 0), n - 1)
        t = (q + 1) * p
        return j // (q + 1) if j < t else (j - t) // q + p

    rows = []
    for r in range(view_size):
        a, ln = int(row_start[r]), int(row_len[r])
        # boundaries: local l where bc(a + l + off) changes (host numpy —
        # vectorized over the ≤ q+1 in-bin indices)
        js = np.clip(np.arange(a + off, a + off + ln), 0, n - 1)
        t = (q + 1) * p
        cs = np.where(js < t, js // (q + 1), (js - t) // q + p)
        cuts = [0] + list(np.flatnonzero(np.diff(cs)) + 1) + [ln]
        cols = [int(cs[c]) for c in cuts[:-1]]
        rows.append([(cuts[i], cuts[i + 1], cols[i])
                     for i in range(len(cols))])
    P = max(len(rw) for rw in rows)
    starts = np.zeros((view_size, P), np.int32)
    ends = np.zeros((view_size, P), np.int32)
    colid = np.zeros((view_size, P), np.int32)
    for r, rw in enumerate(rows):
        for pidx, (s, e, c) in enumerate(rw):
            starts[r, pidx], ends[r, pidx], colid[r, pidx] = s, e, c
    return starts, ends, colid


@functools.partial(jax.jit, static_argnames=("grid_shape", "view_size",
                                             "structural"))
def _make_view_stencil(stencil, grid_shape, view_size: int,
                       structural: bool = True):
    """Pooling straight from a resident (27, nx·ny·nz) stencil —
    SCATTER-FREE (r5: the segment_sum/segment_max formulation lowered to
    serialized TPU scatters and cost 2.07 s of the 2.09 s warm 129³
    deployment predict; this one is dense reshapes + masked reductions).

    Balanced binning is exactly two-reshape packable: the first p row
    bins hold q+1 indices and the rest q (q, p = divmod(n, vs)), so a
    flat (n,) channel packs to (vs, q+1) with one pad column for the
    short bins. Within one row bin, each slot's col bin splits into ≤ 3
    statically-known contiguous pieces (_slot_pieces); per piece the
    channel reduces densely and lands in its static output cell via a
    one-hot combine. Off-grid (slot, i) pairs are masked geometrically,
    which equals the stored 27-point structural pattern of the
    assembled matrices (tests/test_view.py pins equality vs
    make_view_host; test_view_stencil_fast_vs_ref pins it vs the
    segment-op reference twin)."""
    nx, ny, nz = grid_shape
    n = nx * ny * nz
    q, p = divmod(n, view_size)
    L = q + 1 if p else q
    dt = stencil.dtype
    i = jnp.arange(n, dtype=jnp.int32)
    x = i // jnp.int32(ny * nz)
    y = (i // jnp.int32(nz)) % jnp.int32(ny)
    z = i % jnp.int32(nz)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (view_size, L), 1)

    def pack(v):
        """(n,) → (view_size, L) by the balanced-bin layout."""
        if p == 0:
            return v.reshape(view_size, L)
        t = (q + 1) * p
        top = v[:t].reshape(p, q + 1)
        bot = jnp.pad(v[t:].reshape(view_size - p, q), ((0, 0), (0, 1)))
        return jnp.concatenate([top, bot], axis=0)

    v_sum = jnp.zeros((view_size, view_size), dtype=dt)
    v_cnt = jnp.zeros((view_size, view_size), dtype=jnp.int32)
    v_pp = jnp.zeros((view_size, view_size), dtype=dt)
    v_np = jnp.zeros((view_size, view_size), dtype=dt)
    for k in range(27):
        dx, dy, dz = k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1
        off = (dx * ny + dy) * nz + dz
        valid = ((x + dx >= 0) & (x + dx < nx) & (y + dy >= 0)
                 & (y + dy < ny) & (z + dz >= 0) & (z + dz < nz))
        if not structural:
            valid = valid & (stencil[k] != 0)
        vals2d = pack(jnp.where(valid, stencil[k],
                                jnp.zeros((), dtype=dt)))
        valid2d = pack(valid.astype(jnp.int32))
        starts, ends, cid = _slot_pieces(n, view_size, int(off))
        s_c, e_c = jnp.asarray(starts), jnp.asarray(ends)
        # (vs, L, 3) piece mask, fused into the reductions below
        pm = ((iota_l[:, :, None] >= s_c[:, None, :])
              & (iota_l[:, :, None] < e_c[:, None, :]))
        sum_p = jnp.einsum("rl,rlp->rp", vals2d,
                           pm.astype(dt), precision="highest")
        cnt_p = jnp.einsum("rl,rlp->rp", valid2d.astype(jnp.float32),
                           pm.astype(jnp.float32),
                           precision="highest").astype(jnp.int32)
        pp_p = jnp.max(jnp.where(pm, jnp.maximum(vals2d, 0.0)[:, :, None],
                                 jnp.zeros((), dtype=dt)), axis=1)
        np_p = jnp.max(jnp.where(pm, jnp.maximum(-vals2d, 0.0)[:, :, None],
                                 jnp.zeros((), dtype=dt)), axis=1)
        # static one-hot combine into the (vs, vs) image
        P = cid.shape[1]
        oh = np.zeros((view_size, P, view_size), np.float32)
        oh[np.arange(view_size)[:, None], np.arange(P)[None, :], cid] = 1.0
        # mark truly-empty pieces so max channels don't leak their 0 into
        # cell (r, 0): empty pieces produce 0 anyway, and one-hot routes
        # them to col cid=0 — harmless for sum/cnt (adds 0), and for max
        # a 0 contribution equals the init value. (Kept simple.)
        ohj = jnp.asarray(oh)
        v_sum = v_sum + jnp.einsum("rp,rpc->rc", sum_p, ohj.astype(dt),
                                   precision="highest")
        v_cnt = v_cnt + jnp.einsum("rp,rpc->rc", cnt_p.astype(jnp.float32),
                                   ohj, precision="highest").astype(
                                       jnp.int32)
        v_pp = jnp.maximum(v_pp, jnp.max(
            jnp.where(ohj > 0, pp_p[:, :, None],
                      jnp.zeros((), dtype=dt)), axis=1))
        v_np = jnp.maximum(v_np, jnp.max(
            jnp.where(ohj > 0, np_p[:, :, None],
                      jnp.zeros((), dtype=dt)), axis=1))
    return v_sum, v_cnt, v_pp, v_np


@functools.partial(jax.jit, static_argnames=("grid_shape", "view_size",
                                             "structural"))
def _make_view_stencil_ref(stencil, grid_shape, view_size: int,
                           structural: bool = True):
    """Segment-op reference twin of _make_view_stencil (the r4
    formulation) — kept as the parity oracle for the scatter-free
    fast path; see tests/test_view.py."""
    nx, ny, nz = grid_shape
    n = nx * ny * nz
    nb = view_size * view_size
    i = jnp.arange(n, dtype=jnp.int32)
    x = i // jnp.int32(ny * nz)
    y = (i // jnp.int32(nz)) % jnp.int32(ny)
    z = i % jnp.int32(nz)
    br = bin_index(i, n, view_size).astype(jnp.int32)

    dt = stencil.dtype
    v_sum = jnp.zeros(nb, dtype=dt)
    v_cnt = jnp.zeros(nb, dtype=jnp.int32)
    v_pp = jnp.zeros(nb, dtype=dt)
    v_np = jnp.zeros(nb, dtype=dt)
    for k in range(27):
        dx, dy, dz = k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1
        off = (dx * ny + dy) * nz + dz
        valid = ((x + dx >= 0) & (x + dx < nx) & (y + dy >= 0)
                 & (y + dy < ny) & (z + dz >= 0) & (z + dz < nz))
        if not structural:
            # matrices that drop zero taps (e.g. fem.anisotropic_27pt)
            # store only nonzero entries — count those
            valid = valid & (stencil[k] != 0)
        j = jnp.clip(i + jnp.int32(off), 0, n - 1)
        bc = bin_index(j, n, view_size).astype(jnp.int32)
        flat = br * jnp.int32(view_size) + bc
        vals = jnp.where(valid, stencil[k], jnp.zeros((), dtype=dt))
        seg = functools.partial(jax.ops.segment_sum, num_segments=nb,
                                indices_are_sorted=True)
        v_sum = v_sum + seg(vals, flat)
        v_cnt = v_cnt + seg(valid.astype(jnp.int32), flat)
        mx = functools.partial(jax.ops.segment_max, num_segments=nb,
                               indices_are_sorted=True)
        v_pp = jnp.maximum(v_pp, mx(jnp.maximum(vals, 0.0), flat))
        v_np = jnp.maximum(v_np, mx(jnp.maximum(-vals, 0.0), flat))
    shape = (view_size, view_size)
    return (v_sum.reshape(shape), v_cnt.reshape(shape),
            v_pp.reshape(shape), v_np.reshape(shape))


def make_view_stencil(stencil, grid_shape, view_size: int,
                      structural: bool = True) -> View:
    """Device pooling from the structured path's resident stencil — the
    deployment fast path (no host CSR traversal; at 129³ the host
    ufunc.at pooling costs tens of seconds, this costs milliseconds).
    stencil: (27, nx, ny, nz) or (27, nx·ny·nz), csr_to_stencil layout.
    structural=True counts the full geometric 27-pt pattern (matches the
    stored pattern of the FEM assemblies, incl. stored zeros); False
    counts only nonzero taps (matrices that drop zero entries)."""
    nx, ny, nz = grid_shape
    s = jnp.asarray(stencil).reshape(27, nx * ny * nz)
    return View(*_make_view_stencil(s, (nx, ny, nz), view_size,
                                    structural))


def make_view(a: CSR, view_size: int, device: bool = False):
    """Pooling entry point. Returns (View, t_view_microseconds) — the
    reference times this operator into the CSV (view_maker.h:35,72-73)."""
    t0 = time.perf_counter()
    if device:
        from ..sparse.ell import from_csr

        view = make_view_device(from_csr(a), a.row_nnz, view_size)
        jax.block_until_ready(view.sum)
    else:
        view = make_view_host(a, view_size)
    return view, (time.perf_counter() - t0) * 1e6
