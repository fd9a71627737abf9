"""Structured-grid transfer operators (trilinear P, full-weighting R = Pᵀ).

Used by the structured ("PFMG-style") hierarchy mode: on a Dirichlet
interior grid with nodes 0..n-1 per axis, coarse node c (0..m-1, m = n//2)
sits at fine position 2c+1; even fine nodes take weight ½ from each
adjacent coarse node (a missing neighbor at the boundary contributes the
zero boundary value — weight simply dropped).

Two representations, guaranteed identical (tested):
  * `prolongation_csr` — explicit sparse P for the host-side Galerkin
    product R·A·P;
  * `prolongate` / `restrict` — functional 3-D array versions for the
    device V-cycle (pure slice/pad arithmetic, no gather: TPU fast path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.csr import CSR


def coarse_size(n: int) -> int:
    """Coarse nodes per axis: c at fine position 2c+1 ≤ n-1 ⇒ m = n // 2."""
    return n // 2


def _p1d(n: int) -> CSR:
    """1-D prolongation (n × m)."""
    m = coarse_size(n)
    rows, cols, vals = [], [], []
    for i in range(n):
        if i % 2 == 1:
            rows.append(i); cols.append((i - 1) // 2); vals.append(1.0)
        else:
            left = i // 2 - 1
            right = i // 2
            if left >= 0:
                rows.append(i); cols.append(left); vals.append(0.5)
            if right < m:
                rows.append(i); cols.append(right); vals.append(0.5)
    return CSR.from_coo(rows, cols, vals, (n, m))


def prolongation_csr(shape) -> CSR:
    """P = P1x ⊗ P1y ⊗ P1z for a (nx, ny, nz) interior grid (flat indexing
    (gx·ny + gy)·nz + gz, matching the FEM generators)."""
    px, py, pz = (_p1d(s) for s in shape)

    def kron(a: CSR, b: CSR) -> CSR:
        ar, ac, av = a.row_expand()
        br, bc, bv = b.row_expand()
        rows = (ar[:, None] * b.nrows + br[None, :]).ravel()
        cols = (ac[:, None] * b.ncols + bc[None, :]).ravel()
        vals = (av[:, None] * bv[None, :]).ravel()
        return CSR.from_coo(rows, cols, vals,
                            (a.nrows * b.nrows, a.ncols * b.ncols))

    return kron(kron(px, py), pz)


# -- functional (device) versions -------------------------------------------
def _up1(c, n: int, axis: int):
    """Interpolate along `axis`: m coarse values → n fine values."""
    c = jnp.moveaxis(c, axis, 0)
    m = c.shape[0]
    assert m == coarse_size(n), (m, n)
    k = (n + 1) // 2  # number of even fine nodes
    trail = ((0, 0),) * (c.ndim - 1)
    lc = jnp.pad(c, ((1, 0),) + trail)[:k]   # c[j-1] (0 at boundary)
    rc = jnp.pad(c, ((0, 1),) + trail)[:k]   # c[j]   (0 past the end)
    f = jnp.zeros((n,) + c.shape[1:], dtype=c.dtype)
    f = f.at[1::2].set(c)
    f = f.at[0::2].set(0.5 * (lc + rc))
    return jnp.moveaxis(f, 0, axis)


def _down1(f, axis: int):
    """Adjoint of _up1 along `axis`: n fine → m coarse.
    c[j] = f[2j+1] + ½ f[2j] + ½ f[2j+2]."""
    f = jnp.moveaxis(f, axis, 0)
    n = f.shape[0]
    m = coarse_size(n)
    odd = f[1::2][:m]
    even = f[0::2]
    trail = ((0, 0),) * (f.ndim - 1)
    even_p = jnp.pad(even, ((0, 1),) + trail)
    c = odd + 0.5 * even[:m] + 0.5 * even_p[1:m + 1]
    return jnp.moveaxis(c, 0, axis)


def prolongate(c, fine_shape):
    """xf = P xc, both flat; fine_shape = (nx, ny, nz)."""
    nx, ny, nz = fine_shape
    x = c.reshape(tuple(coarse_size(s) for s in fine_shape))
    x = _up1(x, nx, 0)
    x = _up1(x, ny, 1)
    x = _up1(x, nz, 2)
    return x.reshape(-1)


def restrict(fv, fine_shape):
    """xc = Pᵀ xf, both flat."""
    x = fv.reshape(fine_shape)
    x = _down1(x, 0)
    x = _down1(x, 1)
    x = _down1(x, 2)
    return x.reshape(-1)


# -- operator-induced (weighted) transfers -----------------------------------
# P carried as a (27, nx, ny, nz) weight stencil (amg/boxmg.py): W[k][i] is
# the interpolation weight from coarse point at fine position i + DIRS[k].
# Both directions are pure pad/slice/multiply chains — gather-free, fused by
# XLA, and the θ-sensitive replacement for the fixed trilinear pair above.

def _interleave(c, n: int, axis: int):
    """m coarse values → n fine values placed at positions 2i+1, 0 elsewhere."""
    c = jnp.moveaxis(c, axis, 0)
    m = c.shape[0]
    assert m == coarse_size(n), (m, n)
    f = jnp.stack([jnp.zeros_like(c), c], axis=1)
    f = f.reshape((2 * m,) + c.shape[1:])
    if n > 2 * m:
        f = jnp.pad(f, ((0, n - 2 * m),) + ((0, 0),) * (c.ndim - 1))
    return jnp.moveaxis(f, 0, axis)


def _dirs27():
    from .boxmg import DIRS

    return DIRS


def prolongate_w(c, w, fine_shape, strides=(2, 2, 2)):
    """xf = P xc with weight stencil w; c flat coarse, returns flat fine.

    f[i] = Σ_k W[k][i] · inject(c)[i + d_k]   (zero past the boundary).
    Stride-1 axes (not coarsened — θ-driven semicoarsening) are identity."""
    nx, ny, nz = fine_shape
    cs = tuple(coarse_size(s) if st == 2 else s
               for s, st in zip(fine_shape, strides))
    f0 = c.reshape(cs)
    for ax, (n, st) in enumerate(zip(fine_shape, strides)):
        if st == 2:
            f0 = _interleave(f0, n, ax)
    fp = jnp.pad(f0, 1)
    out = jnp.zeros(fine_shape, dtype=c.dtype)
    for k, (dx, dy, dz) in enumerate(_dirs27()):
        out = out + w[k] * fp[1 + dx: 1 + dx + nx,
                              1 + dy: 1 + dy + ny,
                              1 + dz: 1 + dz + nz]
    return out.reshape(-1)


def prolongate_bw(c, w_stack, fine_shape, strides=(2, 2, 2)):
    """Block (vector) prolongation: c flat coarse INTERLEAVED (m·nb), one
    weight stencil per component (w_stack: (nb, 27, nx, ny, nz)) — the
    unknown-based P = blockdiag(P_0…P_{nb-1}) of amg/boxmg_block.py."""
    nb = w_stack.shape[0]
    c2 = c.reshape(-1, nb)
    outs = [prolongate_w(c2[:, b], w_stack[b], fine_shape, strides)
            for b in range(nb)]
    return jnp.stack(outs, axis=-1).reshape(-1)


def restrict_bw(fv, w_stack, fine_shape, strides=(2, 2, 2)):
    """Adjoint of prolongate_bw (per-component weighted restriction)."""
    nb = w_stack.shape[0]
    f2 = fv.reshape(-1, nb)
    outs = [restrict_w(f2[:, b], w_stack[b], fine_shape, strides)
            for b in range(nb)]
    return jnp.stack(outs, axis=-1).reshape(-1)


# -- DIA-form weighted transfers ---------------------------------------------
# prolongate_w / restrict_w above are 27-term pad/slice chains (~80 XLA ops
# each). But both ARE banded operators on the FINE index space:
#
#   P: f[i] = Σ_k (m_k ⊙ W[k])[i] · inject(c)[i + o_k]
#   R: c[J] = subsample( Σ_k shift(m_k ⊙ W[k], o_k)[i] · f[i − o_k] )[J]
#
# with o_k the flat offset of direction d_k and m_k the static in-grid mask
# (1 iff the tap's 3-D neighbor exists — the flat shift would otherwise wrap
# into an adjacent grid line). So each transfer is ONE DIA SpMV — on TPU one
# Pallas launch streaming the weights once — plus a cheap interleave /
# subsample. Offsets are all 27 statically (θ-independent jit keys).

def _ingrid_masks(shape):
    """(27, nx, ny, nz) float masks: m_k = 1 iff i + d_k stays in-grid."""
    nx, ny, nz = shape
    masks = np.zeros((27, nx, ny, nz), dtype=np.float32)
    for k, (dx, dy, dz) in enumerate(_dirs27()):
        sl = tuple(slice(max(0, -d), min(s, s - d))
                   for d, s in ((dx, nx), (dy, ny), (dz, nz)))
        masks[k][sl] = 1.0
    return masks


def _ingrid_axis_tables(shape):
    """Per-axis factors of _ingrid_masks: ax[d+1][i] = (0 ≤ i+d < n).
    Separable so jitted consumers embed three (3, n) constants instead of
    a full (27, nx, ny, nz) literal — that literal is ~1.8 GB at 257³ and
    overflows the remote-compile transport (HTTP 413)."""
    tables = []
    for nax in shape:
        i = np.arange(nax)
        tables.append(np.stack([(i + d >= 0) & (i + d < nax)
                                for d in (-1, 0, 1)]))
    return tables


def _shift_flat(v, o: int):
    """shift(v, o)[i] = v[i − o] (zeros shifted in; nothing wraps)."""
    if o > 0:
        return jnp.concatenate([jnp.zeros((o,), dtype=v.dtype), v[:-o]])
    if o < 0:
        return jnp.concatenate([v[-o:], jnp.zeros((-o,), dtype=v.dtype)])
    return v


@functools.partial(jax.jit, static_argnames=("fine_shape", "strides"))
def transfer_dia(w, fine_shape, strides=(2, 2, 2)):
    """(p_dia, r_dia) DIA operands equivalent to prolongate_w/restrict_w.

    w: (27, nx, ny, nz) weight stencil (numpy or traced). Both operands
    act on FINE-length vectors; collisions of distinct directions on one
    flat offset (tiny axes) are summed — at most one of them is in-grid
    at any point (3-D↔flat bijection), so the sum is exact.

    Jitted (shape/strides static): the band construction is ~100 small
    array ops per level — eager dispatch would pay per-op device latency
    at setup time; one compiled call per (shape, strides) amortizes
    across a whole θ-sweep.
    """
    from ..sparse.dia import DIA, padded_rows

    nx, ny, nz = fine_shape
    n = nx * ny * nz
    dirs = _dirs27()
    ax_t = [jnp.asarray(t) for t in _ingrid_axis_tables(fine_shape)]

    def mask_k(k):
        dx, dy, dz = dirs[k]
        return (ax_t[0][dx + 1][:, None, None]
                & ax_t[1][dy + 1][None, :, None]
                & ax_t[2][dz + 1][None, None, :]).astype(w.dtype)

    r = padded_rows(n, 128)
    npad = r * 128 - n

    flat_off = {}
    for k, (dx, dy, dz) in enumerate(dirs):
        o = (dx * ny + dy) * nz + dz
        flat_off.setdefault(o, []).append(k)
    offs = sorted(flat_off)

    p_rows, r_rows = [], []
    for o in offs:
        band = jnp.zeros((n,), dtype=w.dtype)
        for k in flat_off[o]:
            band = band + (w[k] * mask_k(k)).reshape(-1)
        p_rows.append(jnp.pad(band, (0, npad)) if npad else band)
        rb = _shift_flat(band, o)
        r_rows.append(jnp.pad(rb, (0, npad)) if npad else rb)

    mk = lambda rows, os_: DIA(
        data=jnp.stack(rows).reshape(len(rows), r, 128),
        offsets=tuple(os_), n=n, nnz=n * len(rows))
    return (mk(p_rows, offs), mk(r_rows, [-o for o in offs]))


def interleave_flat(c, fine_shape, strides=(2, 2, 2)):
    """inject(c): flat coarse → flat fine with values at odd positions per
    stride-2 axis and zeros elsewhere (the P-as-DIA operand)."""
    cs = tuple(coarse_size(s) if st == 2 else s
               for s, st in zip(fine_shape, strides))
    f0 = c.reshape(cs)
    for ax, (n, st) in enumerate(zip(fine_shape, strides)):
        if st == 2:
            f0 = _interleave(f0, n, ax)
    return f0.reshape(-1)


def subsample_flat(f, fine_shape, strides=(2, 2, 2)):
    """Values at the coarse positions (2J+1 per stride-2 axis), flat."""
    sl = tuple(slice(1, None, 2) if st == 2 else slice(None)
               for st in strides)
    return f.reshape(fine_shape)[sl].reshape(-1)


def restrict_w(fv, w, fine_shape, strides=(2, 2, 2)):
    """xc = Pᵀ xf with weight stencil w (exact adjoint of prolongate_w).

    c[J] = Σ_k (W[k] ⊙ f)[x_J − d_k],  x_J = 2J+1 per stride-2 axis."""
    nx, ny, nz = fine_shape
    r3 = fv.reshape(fine_shape)
    acc = jnp.zeros(fine_shape, dtype=fv.dtype)
    for k, (dx, dy, dz) in enumerate(_dirs27()):
        pp = jnp.pad(w[k] * r3, 1)
        acc = acc + pp[1 - dx: 1 - dx + nx,
                       1 - dy: 1 - dy + ny,
                       1 - dz: 1 - dz + nz]
    sl = tuple(slice(1, None, 2) if st == 2 else slice(None)
               for st in strides)
    return acc[sl].reshape(-1)
