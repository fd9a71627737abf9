"""Operator-induced structured interpolation + stencil-algebra Galerkin RAP.

This is what makes the TPU fast path (all levels banded / DIA, zero
gathers) sensitive to the strong-threshold θ — the parameter the whole
framework exists to predict (reference: common/amg_solver.h:30,
testcase2-diffusion-structured/src/main.cpp:447-453). The coarse GRID is
geometric (every second node per axis — the PFMG/BoxMG trick that keeps
every Galerkin operator a ≤27-point stencil), but the interpolation
WEIGHTS are computed from the operator with hypre-style classical strength
filtering:

  * strength: j is a strong neighbor of i iff  measure_ij ≥ θ · max_k
    measure_ik with measure = -a_ij for a_ii > 0 (amg/strength.py
    semantics, hypre par_strength);
  * max_row_sum weakening: rows with |Σ_j a_ij| > mrs·|a_ii| interpolate
    nothing (smoother-only F points) — hypre's max_row_sum analog;
  * weights: Ruge–Stüben direct interpolation restricted to the point's
    geometric coarse neighbors G_i (the 2^k lattice neighbors of a fine
    point with k even coordinates):
        α_i = Σ_{l∈N_i} a_il⁻ / Σ_{j∈C_i} a_ij⁻ ,
        β_i = Σ_{l∈N_i} a_il⁺ / Σ_{j∈C_i} a_ij⁺ ,
        w_ij = −(α_i a_ij⁻ + β_i a_ij⁺) / ã_ii ,
    with C_i = strong ∩ G_i, falling back to all of G_i when no geometric
    neighbor is strong, and to equal (trilinear) weights when the operator
    carries no coupling to any geometric coarse neighbor at all (7-point
    fine operators: edge/center points of the coarse cell — exactly where
    PFMG uses geometric weights too). Positive couplings without a positive
    C-neighbor are lumped into the diagonal (ã_ii = a_ii + Σ a_il⁺).

Because all three of P, A, Pᵀ live on a fixed 3³ offset lattice, the
triple product A_c = PᵀAP closes over 27-point stencils on every level and
is computed here with pure strided-slice arithmetic (no sparse formats,
no SpGEMM) — one subsampled multiply–add per (d1, dA, D) offset
combination. Hierarchy SHAPES are θ-independent (geometric coarsening), so
a θ-sweep re-uses one compiled solve executable per grid size — the
property that makes TPU dataset generation cheap.

Everything here is host-side numpy (setup); the solve-side consumers are
sparse/dia.py (operator application) and amg/transfer.py's weighted
functional transfers.
"""

from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR

#: The 27 offsets of the 3³ stencil lattice, index k = ((dx+1)·3+(dy+1))·3+(dz+1).
DIRS = [(dx, dy, dz)
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
K_CENTER = 13  # (0, 0, 0)


def dir_index(d) -> int:
    return ((d[0] + 1) * 3 + (d[1] + 1)) * 3 + (d[2] + 1)


def csr_to_stencil(a: CSR, shape) -> np.ndarray | None:
    """(27, nx, ny, nz) stencil array for a matrix on `shape`, or None if
    any entry reaches beyond the 3³ neighborhood (e.g. degree-2 FEM)."""
    nx, ny, nz = shape
    assert a.nrows == nx * ny * nz, (a.nrows, shape)
    rows, cols, vals = a.row_expand()
    rows = rows.astype(np.int32, copy=False)
    cols = cols.astype(np.int32, copy=False)
    xr, rem = np.divmod(rows, np.int32(ny * nz))
    yr, zr = np.divmod(rem, np.int32(nz))
    xc, rem = np.divmod(cols, np.int32(ny * nz))
    yc, zc = np.divmod(rem, np.int32(nz))
    dx, dy, dz = xc - xr, yc - yr, zc - zr
    if (np.abs(dx).max(initial=0) > 1 or np.abs(dy).max(initial=0) > 1
            or np.abs(dz).max(initial=0) > 1):
        return None
    k = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
    s = np.zeros((27, nx, ny, nz), dtype=a.data.dtype)
    s[k, xr, yr, zr] = vals
    return s


def stencil_to_csr(s: np.ndarray) -> CSR:
    """Inverse of csr_to_stencil (zero entries dropped)."""
    _, nx, ny, nz = s.shape
    n = nx * ny * nz
    rows_l, cols_l, vals_l = [], [], []
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    flat = (x * ny + y) * nz + z
    for k, (dx, dy, dz) in enumerate(DIRS):
        sk = s[k]
        nzmask = sk != 0
        if not nzmask.any():
            continue
        xs, ys, zs = x[nzmask], y[nzmask], z[nzmask]
        xt, yt, zt = xs + dx, ys + dy, zs + dz
        ok = ((xt >= 0) & (xt < nx) & (yt >= 0) & (yt < ny)
              & (zt >= 0) & (zt < nz))
        assert ok.all(), "stencil entry points outside the grid"
        rows_l.append(flat[nzmask])
        cols_l.append((xt * ny + yt) * nz + zt)
        vals_l.append(sk[nzmask])
    if not rows_l:
        return CSR.from_coo([], [], [], (n, n))
    return CSR.from_coo(np.concatenate(rows_l), np.concatenate(cols_l),
                        np.concatenate(vals_l), (n, n))


def choose_strides(s: np.ndarray, theta: float) -> tuple:
    """θ-driven per-axis coarsening pattern (PFMG-style semicoarsening).

    Directional coupling of axis a = Σ |S_d| over taps with d_a ≠ 0; axis a
    is coarsened (stride 2) iff its coupling ≥ θ · max-axis coupling and it
    has ≥ 2 points. Isotropic operators therefore always coarsen all axes;
    anisotropic / layered-coefficient operators drop their weak axes as θ
    rises — trading more levels (setup + cycle cost) for convergence, the
    same strength semantics hypre's θ applies to connections. The
    strongest coarsenable axis is always coarsened (progress guarantee).
    """
    shape = s.shape[1:]
    coup = np.zeros(3)
    for k, d in enumerate(DIRS):
        ab = float(np.abs(s[k]).sum())
        for ax in range(3):
            if d[ax] != 0:
                coup[ax] += ab
    return strides_from_couplings(coup, theta, shape)


def strides_from_couplings(coup, theta: float, shape) -> tuple:
    """The stride decision given per-axis couplings (shared with the
    device setup, which computes `coup` on the TPU)."""
    coup = np.asarray(coup, dtype=float)
    cmax = coup.max()
    if cmax <= 0:
        return tuple(2 if n >= 2 else 1 for n in shape)
    strides = [2 if (coup[ax] >= theta * cmax and shape[ax] >= 2) else 1
               for ax in range(3)]
    if 2 not in strides:
        order = np.argsort(-coup)
        for ax in order:
            if shape[ax] >= 2:
                strides[ax] = 2
                break
    return tuple(strides)


import functools


@functools.lru_cache(maxsize=64)
def _geo_masks_cached(shape, strides):
    return _geo_masks_build(shape, strides)


def _geo_masks(shape, strides=(2, 2, 2)):
    return _geo_masks_cached(tuple(shape), tuple(strides))


def _geo_masks_build(shape, strides):
    """geo[k][x,y,z] = True iff (x,y,z)+DIRS[k] is an in-bounds coarse
    lattice point — the geometric candidate set. Coarse lattice: odd
    coordinates on stride-2 axes, every coordinate on stride-1 axes (whose
    candidate offset must be 0)."""
    per_axis = []
    for n, st in zip(shape, strides):
        i = np.arange(n)
        ax = np.empty((3, n), dtype=bool)
        for j, d in enumerate((-1, 0, 1)):
            t = i + d
            if st == 2:
                ax[j] = ((t % 2) == 1) & (t >= 0) & (t < n)
            else:
                ax[j] = np.full(n, d == 0)
        per_axis.append(ax)
    gx, gy, gz = per_axis
    geo = np.zeros((27,) + tuple(shape), dtype=bool)
    for k, (dx, dy, dz) in enumerate(DIRS):
        geo[k] = (gx[dx + 1][:, None, None] & gy[dy + 1][None, :, None]
                  & gz[dz + 1][None, None, :])
    return geo


def interp_weights(s: np.ndarray, theta: float, max_row_sum: float = 0.9,
                   strides=(2, 2, 2)) -> np.ndarray:
    """(27, nx, ny, nz) prolongation weights W: W[k][i] = P[i, coarse(i+d_k)].

    C points (all-odd coordinates) carry identity (W[center] = 1); F points
    carry the θ-filtered direct-interpolation weights described in the
    module docstring.
    """
    shape = s.shape[1:]
    dt = s.dtype
    diag = s[K_CENTER]
    offd = np.ones(27, dtype=bool)
    offd[K_CENTER] = False

    zero = dt.type(0.0)
    neg = np.minimum(s, zero)
    pos = np.maximum(s, zero)
    neg_sum = neg[offd].sum(axis=0)
    pos_sum = pos[offd].sum(axis=0)

    # classical strength measure (amg/strength.py semantics)
    sign = np.where(diag > 0, dt.type(-1.0), dt.type(1.0))
    meas = sign[None] * s
    meas[K_CENTER] = zero
    meas_pos = np.maximum(meas, zero)
    row_max = meas_pos.max(axis=0)
    strong = (meas > 0) & (meas >= dt.type(theta) * row_max[None])
    strong[K_CENTER] = False

    row_sum = s.sum(axis=0)
    weak_row = np.zeros(shape, dtype=bool)
    if max_row_sum < 1.0:
        weak_row = np.abs(row_sum) > max_row_sum * np.abs(diag)

    geo = _geo_masks(shape, strides)

    # selection: STRONG geometric C neighbors only. Three point classes
    # fall out (mirroring hypre's classical-interpolation behavior under a
    # fixed coarse lattice):
    #   * has_strong_geo — operator-induced weights over the strong set;
    #   * couples to geometric C points but none is strong at this θ —
    #     interpolate NOTHING (smoother-only F point). This is the honest
    #     analog of hypre's F points losing their interpolatory set as θ
    #     rises, and is what makes high θ genuinely cost iterations;
    #   * no operator coupling to any geometric C point at all (7-point
    #     fine stencils: coarse-cell edge/center points) — θ-independent
    #     geometric (trilinear) weights, exactly PFMG's choice.
    use = geo & strong
    has_strong_geo = use.any(axis=0)
    geo_coupled = (np.where(geo, np.abs(s), zero).sum(axis=0)) > 0
    c_neg = np.where(use, neg, zero).sum(axis=0)
    c_pos = np.where(use, pos, zero).sum(axis=0)
    # β-part: positive geometric C couplings are never "strong" (measure
    # < 0); where the strong set exists, let positives ride along like
    # hypre's signed direct interpolation
    use_pos = geo & (pos > 0) & has_strong_geo[None]
    c_pos = c_pos + np.where(use_pos & ~use, pos, zero).sum(axis=0)
    use = use | use_pos

    # lump positive couplings into the diagonal where no positive C coupling
    lump = c_pos == 0
    diag_eff = np.where(lump, diag + pos_sum, diag)
    one = dt.type(1.0)
    safe = lambda num, den: np.where(den != 0,
                                     num / np.where(den == 0, one, den), zero)
    alpha = safe(neg_sum, c_neg)
    beta = np.where(lump, zero, safe(pos_sum, c_pos))

    w = np.where(use, -(alpha[None] * neg + beta[None] * pos), zero)
    w = w / np.where(diag_eff == 0, one, diag_eff)[None]
    w = np.where(diag_eff[None] != 0, w, zero)

    # geometric fallback ONLY for the structurally-uncoupled class; the
    # "coupled but nothing strong" class keeps its zero row
    uncoupled = ~geo_coupled
    if uncoupled.any():
        n_geo = geo.sum(axis=0)
        k_even = sum((((np.arange(n) % 2) == 0) if st == 2
                      else np.zeros(n, dtype=bool)).reshape(
            [-1 if ax == i else 1 for i in range(3)]).astype(np.int64)
            for ax, (n, st) in enumerate(zip(shape, strides)))
        tri = np.where(geo, (0.5 ** k_even)[None].astype(dt), zero)
        w = np.where((uncoupled & (n_geo > 0))[None], tri, w)
    w = np.where((geo_coupled & ~has_strong_geo)[None], zero, w)

    # max_row_sum rows: smoother-only (zero interpolation)
    w = np.where(weak_row[None], zero, w)

    # C points: identity row
    odd = [((np.arange(n) % 2) == 1) if st == 2 else np.ones(n, dtype=bool)
           for n, st in zip(shape, strides)]
    c_mask = (odd[0][:, None, None] & odd[1][None, :, None]
              & odd[2][None, None, :])
    w = np.where(c_mask[None], zero, w)
    w[K_CENTER] = np.where(c_mask, one, w[K_CENTER])
    return w


def _shift0(arr: np.ndarray, d) -> np.ndarray:
    """out[i] = arr[i + d], zero where i + d walks off the grid."""
    out = np.zeros_like(arr)
    src = []
    dst = []
    for ax, dd in enumerate(d):
        n = arr.shape[ax]
        if dd >= 0:
            src.append(slice(dd, n))
            dst.append(slice(0, n - dd))
        else:
            src.append(slice(0, n + dd))
            dst.append(slice(-dd, n))
    out[tuple(dst)] = arr[tuple(src)]
    return out


def interp_weights_boxmg(s: np.ndarray, theta: float,
                         max_row_sum: float = 0.9,
                         strides=(2, 2, 2)) -> np.ndarray:
    """θ-filtered BoxMG (Dendy) operator-induced prolongation weights.

    Same output contract as interp_weights — (27, nx, ny, nz) with
    W[k][i] = P[i, coarse(i + d_k)] — but the weights come from the
    classical BoxMG approximate harmonic extension instead of
    Ruge–Stüben direct interpolation, built class by class:

      * face F points (1 even stride-2 coordinate) collapse the
        (θ-filtered) 27-point row onto their axis and interpolate from
        their 2 coarse line neighbors: w(±1) = −ŝ1(±1)/ŝ1(0);
      * edge F points (2 even) collapse onto their plane; the in-plane
        C couplings contribute directly and the in-plane face-F
        couplings substitute their already-computed interpolants;
      * center F points (3 even) substitute faces + edges, no collapse.

    Every substitution lands on the geometric corner lattice, so the
    3³-offset closure (and the all-DIA V-cycle) is preserved. The
    strong-threshold enters exactly as in hypre's classical filtering:
    couplings with measure < θ·row_max are LUMPED INTO THE DIAGONAL
    before collapsing — at θ→0 this is textbook BoxMG (level-independent
    convergence on Poisson), rising θ strips the interpolatory set and
    genuinely costs iterations (the t(θ) signal the ANN learns).
    Direct-interp counterpart kept as interp_weights (the round-2
    baseline; AMGParams.structured_interp selects).
    """
    from itertools import combinations, product

    shape = s.shape[1:]
    dt = s.dtype
    zero = dt.type(0.0)
    diag = s[K_CENTER]

    # hypre-style strength measure (same as interp_weights)
    sign = np.where(diag > 0, dt.type(-1.0), dt.type(1.0))
    meas = sign[None] * s
    meas[K_CENTER] = zero
    row_max = np.maximum(meas, zero).max(axis=0)
    strong = (meas > 0) & (meas >= dt.type(theta) * row_max[None])
    strong[K_CENTER] = False

    # θ-filtered stencil: weak off-diagonals lumped into the center
    shat = np.where(strong, s, zero)
    offd = np.ones(27, dtype=bool)
    offd[K_CENTER] = False
    weak_sum = np.where(strong, zero, s)[offd].sum(axis=0)
    shat[K_CENTER] = diag + weak_sum

    # per-axis parity (stride-1 axes are never interpolation axes)
    par = [((np.arange(n) % 2) == 0) if st == 2 else np.zeros(n, bool)
           for n, st in zip(shape, strides)]

    def axv(ax, v):
        return v.reshape([-1 if i == ax else 1 for i in range(3)])

    one = dt.type(1.0)
    w = np.zeros_like(s)
    c_mask = (axv(0, ~par[0]) & axv(1, ~par[1]) & axv(2, ~par[2]))
    w[K_CENTER] = np.where(c_mask, one, zero)

    axes2 = tuple(ax for ax in range(3) if strides[ax] == 2)
    for r in (1, 2, 3):
        for E in combinations(axes2, r):
            m_e = np.ones(shape, dtype=bool)
            for ax in range(3):
                m_e = m_e & axv(ax, par[ax] if ax in E else ~par[ax])
            if not m_e.any():
                continue
            # collapse over the non-E axes: sc[d|E] = Σ_{d complement}
            sc = {}
            for k, d in enumerate(DIRS):
                if not np.any(shat[k]):
                    continue
                key = tuple(d[ax] if ax in E else 0 for ax in range(3))
                acc = sc.setdefault(key, np.zeros(shape, dtype=dt))
                acc += shat[k]
            denom = sc.get((0, 0, 0), np.zeros(shape, dtype=dt))
            num = np.zeros_like(s)
            for dn, c in sc.items():
                if dn == (0, 0, 0):
                    continue
                e_j = tuple(ax for ax in E if dn[ax] == 0)
                if not e_j:
                    num[dir_index(dn)] += -c            # direct C coupling
                    continue
                # substitute the class-E_j neighbor's interpolant
                for signs in product((-1, 1), repeat=len(e_j)):
                    dp = [0, 0, 0]
                    for ax, sg in zip(e_j, signs):
                        dp[ax] = sg
                    tot = tuple(dn[ax] + dp[ax] for ax in range(3))
                    num[dir_index(tot)] += -c * _shift0(
                        w[dir_index(tuple(dp))], dn)
            inv_d = np.where(denom != 0, one / np.where(denom == 0, one,
                                                        denom), zero)
            w = np.where(m_e[None], num * inv_d[None], w)

    # max_row_sum rows: smoother-only (zero interpolation)
    if max_row_sum < 1.0:
        weak_row = np.abs(s.sum(axis=0)) > dt.type(max_row_sum) * \
            np.abs(diag)
        w = np.where((weak_row & ~c_mask)[None], zero, w)
    return w


# per-axis (s = d1+dA) → [(D, dJ)] with dJ = stride·D − s ∈ {-1, 0, 1}
_DJ_TABLE2 = {-2: [(-1, 0)], -1: [(-1, -1), (0, 1)], 0: [(0, 0)],
              1: [(0, -1), (1, 1)], 2: [(1, 0)]}
_DJ_TABLE1 = {-2: [], -1: [(-1, 0)], 0: [(0, 0)], 1: [(1, 0)], 2: []}


def rap_stencil(s: np.ndarray, w: np.ndarray,
                strides=(2, 2, 2), w_left: np.ndarray | None = None
                ) -> np.ndarray:
    """Galerkin coarse stencil A_c = Pᵀ A P on the (per-axis) coarse lattice.

    A term-by-term contraction over offset combinations: for coarse point
    I (fine position x_I = stride·I + stride−1 per axis) and coarse offset
    D,

      A_c[D][I] += W[-d1][x_I+d1] · A[dA][x_I+d1] · W[dJ][x_I+d1+dA],
      dJ = stride·D − d1 − dA  per axis, all offsets in {-1,0,1},

    summed over d1, dA. Every factor is evaluated on a coarse-sized
    subsample (strided slice of a ghost-padded array), so the cost is
    O(#terms · Π m) with no sparse machinery. 27-point closure holds for
    any stride pattern (on stride-1 axes W is axis-diagonal, forcing
    d1 = dJ = 0 there).

    w_left: weight stencil of the LEFT factor (restriction = w_leftᵀ)
    when it differs from the right one — the unknown-based block path
    computes (A_c)_{ci,cj} = P_ciᵀ A_{ci,cj} P_cj with per-component P
    (amg/boxmg_block.py). Default: symmetric, w_left = w.
    """
    shape = s.shape[1:]
    m = tuple(n // st for n, st in zip(shape, strides))
    tables = [_DJ_TABLE2 if st == 2 else _DJ_TABLE1 for st in strides]
    dt = s.dtype
    pad = ((0, 0), (2, 2), (2, 2), (2, 2))
    sp = np.pad(s, pad)
    wp = np.pad(w, pad)
    wlp = wp if w_left is None else np.pad(w_left, pad)
    wl_nonzero = ({k: bool(np.any(w_left[k])) for k in range(27)}
                  if w_left is not None else None)

    def sub(arr_k, t):
        # values at fine points x_I + t over the coarse lattice
        sl = tuple(
            slice(2 + (st - 1) + t[ax], 2 + (st - 1) + t[ax] + st * m[ax], st)
            for ax, st in enumerate(strides))
        return arr_k[sl]

    a_c = np.zeros((27,) + m, dtype=dt)
    a_nonzero = [k for k in range(27) if np.any(s[k])]
    w_nonzero = {k: bool(np.any(w[k])) for k in range(27)}
    for d1 in DIRS:
        k1 = dir_index((-d1[0], -d1[1], -d1[2]))
        if not (wl_nonzero or w_nonzero)[k1]:
            continue
        w1 = sub(wlp[k1], d1)
        for ka in a_nonzero:
            da = DIRS[ka]
            wa = w1 * sub(sp[ka], d1)
            t2 = (d1[0] + da[0], d1[1] + da[1], d1[2] + da[2])
            for dx2, djx in tables[0][t2[0]]:
                for dy2, djy in tables[1][t2[1]]:
                    for dz2, djz in tables[2][t2[2]]:
                        kj = dir_index((djx, djy, djz))
                        if not w_nonzero[kj]:
                            continue
                        kd = dir_index((dx2, dy2, dz2))
                        a_c[kd] += wa * sub(wp[kj], t2)
    return a_c


def interp_csr(w: np.ndarray, strides=(2, 2, 2)) -> CSR:
    """Explicit sparse P (n_fine × n_coarse) from the weight stencil —
    used for stats/tests and the CSR-SpGEMM cross-check."""
    shape = w.shape[1:]
    nx, ny, nz = shape
    mx, my, mz = (n // st for n, st in zip(shape, strides))
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    flat = (x * ny + y) * nz + z
    rows_l, cols_l, vals_l = [], [], []

    def cidx(t, ax):
        return (t - 1) // 2 if strides[ax] == 2 else t

    for k, (dx, dy, dz) in enumerate(DIRS):
        wk = w[k]
        nzmask = wk != 0
        if not nzmask.any():
            continue
        xt, yt, zt = x[nzmask] + dx, y[nzmask] + dy, z[nzmask] + dz
        for t, ax in ((xt, 0), (yt, 1), (zt, 2)):
            assert (t % 2 == 1).all() if strides[ax] == 2 else True, \
                "weight points to a non-coarse node"
        ci = (cidx(xt, 0) * my + cidx(yt, 1)) * mz + cidx(zt, 2)
        rows_l.append(flat[nzmask])
        cols_l.append(ci)
        vals_l.append(wk[nzmask])
    return CSR.from_coo(np.concatenate(rows_l), np.concatenate(cols_l),
                        np.concatenate(vals_l),
                        (nx * ny * nz, mx * my * mz))


def stencil_to_dia(s: np.ndarray, dtype=None, cols: int = 128,
                   keep_all_slots: bool = False):
    """DIA operator straight from the stencil array (no CSR round trip).

    Flat offset of direction d on an (nx, ny, nz) grid with row-major flat
    indexing is (dx·ny + dy)·nz + dz; boundary taps are zero in the stencil
    by construction, which is exactly the DIA contract that makes circular/
    flat wrap values harmless (sparse/dia.py docstring). Distinct directions
    can collide on one flat offset for tiny ny/nz — summed (both operands
    cannot be simultaneously nonzero at a point: one of them always walks
    off the grid there... they are simply accumulated)."""
    import jax.numpy as jnp

    from ..sparse.dia import DIA

    _, nx, ny, nz = s.shape
    n = nx * ny * nz
    if dtype is None:
        dtype = s.dtype
    flat = {}
    nnz = 0
    for k, (dx, dy, dz) in enumerate(DIRS):
        sk = s[k]
        # keep_all_slots: carry structurally-possible zero diagonals too —
        # Galerkin levels of a θ-sweep then share one offsets tuple (and
        # one compiled solve) even when a θ happens to zero a direction
        if not (keep_all_slots or np.any(sk)):
            continue
        # STRUCTURAL count (in-grid taps of this direction): θ-independent,
        # so the DIA static metadata — and with it the jit cache key of the
        # solve — is stable across a θ-sweep
        nnz += (nx - abs(dx)) * (ny - abs(dy)) * (nz - abs(dz))
        off = (dx * ny + dy) * nz + dz
        acc = flat.setdefault(off, np.zeros(n, dtype=dtype))
        acc += sk.reshape(-1).astype(dtype)
    offs = sorted(flat)
    from ..sparse.dia import padded_rows

    r = padded_rows(n, cols)
    data = np.zeros((max(len(offs), 1), r * cols), dtype=dtype)
    for i, o in enumerate(offs):
        data[i, :n] = flat[o]
    return DIA(data=jnp.asarray(data.reshape(-1, r, cols)),
               offsets=tuple(offs) or (0,), n=n, nnz=nnz)


def stencil_matvec(s: np.ndarray, x: np.ndarray) -> np.ndarray:
    """y = A x for a stencil operator, host numpy (flat x, flat y)."""
    shape = s.shape[1:]
    nx, ny, nz = shape
    xp = np.pad(x.reshape(shape), 1)
    y = np.zeros(shape, dtype=np.result_type(s, x))
    for k, (dx, dy, dz) in enumerate(DIRS):
        if not np.any(s[k]):
            continue
        y += s[k] * xp[1 + dx: 1 + dx + nx, 1 + dy: 1 + dy + ny,
                       1 + dz: 1 + dz + nz]
    return y.reshape(-1)


def stencil_lam_max(s: np.ndarray, inv_diag: np.ndarray, iters: int = 12,
                    seed: int = 7, big_n: int = 100_000) -> float:
    """λ_max(D⁻¹A) upper estimate: Gershgorin for big levels, power
    iteration (+10% margin) for small ones — amg/hierarchy.py's
    _estimate_lam_max policy, stencil-native."""
    n = inv_diag.size
    absum = np.abs(s).sum(axis=0).reshape(-1)
    gersh = float(np.max(absum * np.abs(inv_diag))) if n else 1.0
    if n > big_n:
        return gersh if gersh > 0 else 1.0
    rng = np.random.default_rng(seed)
    x = rng.random(n) - 0.5
    x /= np.linalg.norm(x) + 1e-300
    lam = 1.0
    for _ in range(iters):
        y = inv_diag * stencil_matvec(s, x)
        lam = float(np.linalg.norm(y))
        if lam == 0.0:
            return 1.0
        x = y / lam
    return min(1.1 * lam, gersh if gersh > 0 else 1.1 * lam)


def stencil_diag_stats(s: np.ndarray):
    """(inv_diag, inv_l1, gershgorin λ_max(D⁻¹A) bound), all flat."""
    diag = s[K_CENTER].reshape(-1)
    absum = np.abs(s).sum(axis=0).reshape(-1)
    inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
    inv_l1 = np.where(absum != 0, 1.0 / np.where(absum == 0, 1, absum), 0.0)
    lam = float(np.max(absum * np.abs(inv_diag))) if diag.size else 1.0
    return inv_diag, inv_l1, (lam if lam > 0 else 1.0)
