"""Wide (5³-reach) fine-level support for the structured fast path.

Degree-2 tensor FEM operators couple nodes up to TWO steps per axis
(125-point stencils), which the 3³ stencil algebra of amg/boxmg.py
cannot hold. But the Q2 NODE grid contains the Q1 VERTEX grid as
exactly the odd-coordinate (interior-index) sublattice — one geometric
stride-2 coarsening is p-coarsening onto the vertex space. This module
provides that first level:

  * csr_to_stencil_wide: (125, nx, ny, nz) representation, offsets
    index k5 = ((dx+2)·5 + (dy+2))·5 + (dz+2);
  * trilinear weights (the tensor ½/¼/⅛ Q2→Q1 nodal interpolation — the
    canonical p-MG prolongation; reuses boxmg's geometric fallback);
  * rap_stencil_wide: Galerkin A_c = Pᵀ A P for a 5³ operator with a
    3³-lattice P. The coarse support bound is |D| ≤ 2, but with
    cell-local P the restricted operator couples only adjacent vertices
    (the coarse basis functions have Q1 supports), so the ±2 bands
    vanish analytically; they are measured and folded (they only carry
    roundoff) and the result is a 27-point stencil — every level below
    rides the unchanged θ-sensitive BoxMG path (amg/boxmg.py).

Reference parity: tc2 degree-2/3 sweeps run BoomerAMG through the same
amg_solver contract (testcase2-diffusion-structured/datagen.py:29-52);
this path makes those sweeps TPU-native instead of θ-blind-trilinear.
The solve side needs no new kernels — the 125-offset fine level is just
a wider DIA operator (sparse/dia.py handles arbitrary offsets; the vmem
choosers fall back to per-step kernels when the fused windows outgrow
the budget).
"""

from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR
from .boxmg import DIRS, dir_index

#: the 125 offsets of the 5³ lattice
DIRS5 = [(dx, dy, dz)
         for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)
         for dz in (-2, -1, 0, 1, 2)]
K5_CENTER = 62


def dir_index5(d) -> int:
    return ((d[0] + 2) * 5 + (d[1] + 2)) * 5 + (d[2] + 2)


def csr_to_stencil_wide(a: CSR, shape) -> np.ndarray | None:
    """(125, nx, ny, nz) stencil for a ≤5³-reach matrix, None if wider."""
    nx, ny, nz = shape
    assert a.nrows == nx * ny * nz, (a.nrows, shape)
    rows, cols, vals = a.row_expand()
    rows = rows.astype(np.int64, copy=False)
    cols = cols.astype(np.int64, copy=False)
    xr, rem = np.divmod(rows, np.int64(ny * nz))
    yr, zr = np.divmod(rem, np.int64(nz))
    xc, rem = np.divmod(cols, np.int64(ny * nz))
    yc, zc = np.divmod(rem, np.int64(nz))
    dx, dy, dz = xc - xr, yc - yr, zc - zr
    if (np.abs(dx).max(initial=0) > 2 or np.abs(dy).max(initial=0) > 2
            or np.abs(dz).max(initial=0) > 2):
        return None
    k = ((dx + 2) * 5 + (dy + 2)) * 5 + (dz + 2)
    s = np.zeros((125, nx, ny, nz), dtype=a.data.dtype)
    s[k, xr, yr, zr] = vals
    return s


# per-axis (s = d1+dA with |d1| ≤ 1, |dA| ≤ 2) → [(D, dJ)] with
# dJ = 2·D − s ∈ {-1, 0, 1}; |D| ≤ 2
_DJ_TABLE2_WIDE = {
    -4: [(-2, 0)],
    -3: [(-2, -1), (-1, 1)],
    -2: [(-1, 0)],
    -1: [(-1, -1), (0, 1)],
    0: [(0, 0)],
    1: [(0, -1), (1, 1)],
    2: [(1, 0)],
    3: [(2, 1), (1, -1)],
    4: [(2, 0)],
}


def rap_stencil_wide(s5: np.ndarray, w: np.ndarray,
                     fold_tol: float = 0.05) -> np.ndarray:
    """Approximate-Galerkin coarse stencil for a 5³ fine operator and a
    3³-lattice prolongation, full (2, 2, 2) coarsening.

    Same term-by-term contraction as boxmg.rap_stencil with the A offset
    range widened to ±2. On the boundary-inclusive tc2 grids the coarse
    lattice (odd coordinates) sits on MIDSIDE nodes, whose coarse basis
    functions overlap across one cell — the exact Galerkin operator
    carries small |D| = 2 bands (measured ≤ ~0.4% of the diagonal /
    ~5% of the |D| = 1 bands on 6-decade-jump tc2 problems). They are
    FOLDED into the adjacent in-lattice band so every coarse level stays
    a 27-point stencil (the all-DIA V-cycle closure). This perturbs only
    the PRECONDITIONER — PCG iterates on the exact fine operator — and
    costs no measurable iterations (10-11 at 6-decade jumps,
    tests/test_structured_mg.py::TestWideDeg2). fold_tol guards against
    a non-smooth prolongation leaking O(1) mass out of the lattice
    (relative to the coarse diagonal scale).
    """
    shape = s5.shape[1:]
    m = tuple(n // 2 for n in shape)
    dt = s5.dtype
    pad = ((0, 0), (4, 4), (4, 4), (4, 4))
    sp = np.pad(s5, pad)
    wp = np.pad(w, pad)

    def sub(arr_k, t):
        sl = tuple(slice(4 + 1 + t[ax], 4 + 1 + t[ax] + 2 * m[ax], 2)
                   for ax in range(3))
        return arr_k[sl]

    # wide accumulator over the 5³ coarse lattice
    a_c5 = {}
    a_nonzero = [k for k in range(125) if np.any(s5[k])]
    w_nonzero = {k: bool(np.any(w[k])) for k in range(27)}
    for d1 in DIRS:
        k1 = dir_index((-d1[0], -d1[1], -d1[2]))
        if not w_nonzero[k1]:
            continue
        w1 = sub(wp[k1], d1)
        for ka in a_nonzero:
            da = DIRS5[ka]
            wa = w1 * sub(sp[ka], d1)
            t2 = (d1[0] + da[0], d1[1] + da[1], d1[2] + da[2])
            for dx2, djx in _DJ_TABLE2_WIDE[t2[0]]:
                for dy2, djy in _DJ_TABLE2_WIDE[t2[1]]:
                    for dz2, djz in _DJ_TABLE2_WIDE[t2[2]]:
                        kj = dir_index((djx, djy, djz))
                        if not w_nonzero[kj]:
                            continue
                        kd = (dx2, dy2, dz2)
                        acc = a_c5.setdefault(
                            kd, np.zeros(m, dtype=dt))
                        acc += wa * sub(wp[kj], t2)

    a_c = np.zeros((27,) + m, dtype=dt)
    scale = max(float(np.abs(a_c5.get((0, 0, 0), np.zeros(1))).max()), 1.0)
    for kd, v in a_c5.items():
        if max(abs(c) for c in kd) <= 1:
            a_c[dir_index(kd)] += v
            continue
        # |D| = 2 band: fold into the clamped band (preconditioner-only
        # perturbation, see docstring); refuse if it carries real mass
        peak = float(np.abs(v).max())
        if peak > fold_tol * scale:
            raise ValueError(
                f"wide RAP |D|=2 band {kd} carries non-negligible mass "
                f"(peak {peak:.3e} vs diagonal scale {scale:.3e}) — "
                "folding would damage the coarse operator")
        clamped = tuple(int(np.clip(c, -1, 1)) for c in kd)
        a_c[dir_index(clamped)] += v
    return a_c


def trilinear_weights_wide(shape, dtype) -> np.ndarray:
    """The tensor Q2→Q1 nodal interpolation as a (27, nx, ny, nz) weight
    stencil: vertex (odd-coordinate) nodes carry identity, edge/face/
    center nodes average their 2/4/8 cell vertices (½/¼/⅛) — exactly
    boxmg.interp_weights' geometric fallback, exposed for the wide
    first level where the operator-induced machinery does not apply."""
    from .boxmg import _geo_masks

    geo = _geo_masks(tuple(shape), (2, 2, 2))
    ev = [((np.arange(n) % 2) == 0) for n in shape]

    def axv(ax, v):
        return v.reshape([-1 if i == ax else 1 for i in range(3)])

    k_even = (axv(0, ev[0]).astype(np.int64)
              + axv(1, ev[1]).astype(np.int64)
              + axv(2, ev[2]).astype(np.int64))
    w = np.where(geo, (0.5 ** k_even)[None].astype(dtype),
                 dtype.type(0.0) if hasattr(dtype, "type") else 0.0)
    w = w.astype(dtype)
    c_mask = k_even == 0
    from .boxmg import K_CENTER

    w = np.where(c_mask[None], 0.0, w)
    w[K_CENTER] = np.where(c_mask, 1.0, w[K_CENTER])
    return w


def stencil_to_dia_wide(s5: np.ndarray, dtype=None, cols: int = 128):
    """DIA operator from a (125, nx, ny, nz) stencil (wide twin of
    boxmg.stencil_to_dia; structural nnz count, all math identical)."""
    import jax.numpy as jnp

    from ..sparse.dia import DIA, padded_rows

    _, nx, ny, nz = s5.shape
    n = nx * ny * nz
    if dtype is None:
        dtype = s5.dtype
    flat = {}
    nnz = 0
    for k, (dx, dy, dz) in enumerate(DIRS5):
        sk = s5[k]
        if not np.any(sk):
            continue
        nnz += ((nx - abs(dx)) * (ny - abs(dy)) * (nz - abs(dz)))
        off = (dx * ny + dy) * nz + dz
        acc = flat.setdefault(off, np.zeros(n, dtype=dtype))
        acc += sk.reshape(-1).astype(dtype)
    offs = sorted(flat)
    r = padded_rows(n, cols)
    data = np.zeros((max(len(offs), 1), r * cols), dtype=dtype)
    for i, o in enumerate(offs):
        data[i, :n] = flat[o]
    return DIA(data=jnp.asarray(data.reshape(-1, r, cols)),
               offsets=tuple(offs) or (0,), n=n, nnz=nnz)


def stencil_matvec_wide(s5: np.ndarray, x: np.ndarray) -> np.ndarray:
    """y = A x for a 5³ stencil operator, host numpy (testing oracle)."""
    shape = s5.shape[1:]
    nx, ny, nz = shape
    xp = np.pad(x.reshape(shape), 2)
    y = np.zeros(shape, dtype=np.result_type(s5, x))
    for k, (dx, dy, dz) in enumerate(DIRS5):
        if not np.any(s5[k]):
            continue
        y += s5[k] * xp[2 + dx: 2 + dx + nx, 2 + dy: 2 + dy + ny,
                        2 + dz: 2 + dz + nz]
    return y.reshape(-1)
