"""Device-side (jitted) structured AMG setup — boxmg.py on the TPU.

Why: the host-side setup's cost on a tunnel-attached TPU is dominated by
shipping the per-level weight/operator arrays to the device (~70 MB at
64³), and a θ-sweep pays it per θ. Here the ONLY upload is the fine-level
stencil (θ-independent — uploaded once per problem), and everything else
— strength filtering, interpolation weights, the Galerkin RAP
contraction, diagonal/ℓ1/λ_max stats, the dense coarse inverse — runs on
device under jit with θ as a TRACED scalar: one compiled executable per
(shape, strides, slot-set) serves every θ in a sweep.

The math is the exact jnp twin of amg/boxmg.py (same masks, same term
enumeration); boxmg.py remains the host/testing oracle, and
tests/test_boxmg.py pins the two against each other.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .boxmg import (DIRS, K_CENTER, _DJ_TABLE1, _DJ_TABLE2, dir_index)


def _geo_axis_tables(shape, strides):
    """Per-axis factors of boxmg._geo_masks as tiny (3, n) host tables:
    geo[k] = gx[dx+1] ⊗ gy[dy+1] ⊗ gz[dz+1]. Kept separable so jitted
    consumers embed O(n) constants — a materialized (27, nx, ny, nz)
    literal is ~2 GB at 257³ and overflows the remote-compile transport
    (HTTP 413 through the axon tunnel)."""
    tables = []
    for n, st in zip(shape, strides):
        i = np.arange(n)
        ax = np.empty((3, n), dtype=bool)
        for j, d in enumerate((-1, 0, 1)):
            t = i + d
            ax[j] = (((t % 2) == 1) & (t >= 0) & (t < n)) if st == 2 \
                else np.full(n, d == 0)
        tables.append(ax)
    return tables


def _geo_masks_dev(shape, strides):
    """(27, nx, ny, nz) device bool — on-device outer product of the
    per-axis tables; same truth table as boxmg._geo_masks."""
    gx, gy, gz = (jnp.asarray(t) for t in _geo_axis_tables(shape, strides))
    ix = np.array([d[0] + 1 for d in DIRS])
    iy = np.array([d[1] + 1 for d in DIRS])
    iz = np.array([d[2] + 1 for d in DIRS])
    return (gx[ix][:, :, None, None] & gy[iy][:, None, :, None]
            & gz[iz][:, None, None, :])


def _parity_vectors(shape, strides, parity: int):
    """Per-axis coordinate-parity tests as device vectors (stride-1 axes:
    even → all-False, odd → all-True, matching the host path)."""
    out = []
    for n, st in zip(shape, strides):
        if st == 2:
            v = (np.arange(n) % 2) == parity
        else:
            v = (np.zeros if parity == 0 else np.ones)(n, dtype=bool)
        out.append(jnp.asarray(v))
    return out


@functools.partial(jax.jit, static_argnames=("strides", "mrs"))
def interp_weights_dev(s, theta, *, strides=(2, 2, 2), mrs=0.9):
    """jnp twin of boxmg.interp_weights (θ traced)."""
    shape = s.shape[1:]
    dt = s.dtype
    diag = s[K_CENTER]
    offd = np.ones(27, dtype=bool)
    offd[K_CENTER] = False

    neg = jnp.minimum(s, 0.0)
    pos = jnp.maximum(s, 0.0)
    neg_sum = neg[offd].sum(axis=0)
    pos_sum = pos[offd].sum(axis=0)

    sign = jnp.where(diag > 0, dt.type(-1.0), dt.type(1.0))
    meas = sign[None] * s
    meas = meas.at[K_CENTER].set(0.0)
    row_max = jnp.maximum(meas, 0.0).max(axis=0)
    theta = jnp.asarray(theta).astype(dt)
    strong = (meas > 0) & (meas >= theta * row_max[None])
    strong = strong.at[K_CENTER].set(False)

    row_sum = s.sum(axis=0)
    weak_row = jnp.abs(row_sum) > dt.type(mrs) * jnp.abs(diag) \
        if mrs < 1.0 else jnp.zeros(shape, dtype=bool)

    geo = _geo_masks_dev(shape, strides)

    use = geo & strong
    has_strong_geo = use.any(axis=0)
    geo_coupled = jnp.where(geo, jnp.abs(s), 0.0).sum(axis=0) > 0
    c_neg = jnp.where(use, neg, 0.0).sum(axis=0)
    c_pos = jnp.where(use, pos, 0.0).sum(axis=0)
    use_pos = geo & (pos > 0) & has_strong_geo[None]
    c_pos = c_pos + jnp.where(use_pos & ~use, pos, 0.0).sum(axis=0)
    use = use | use_pos

    lump = c_pos == 0
    diag_eff = jnp.where(lump, diag + pos_sum, diag)
    safe = lambda num, den: jnp.where(den != 0,
                                      num / jnp.where(den == 0, 1, den), 0.0)
    alpha = safe(neg_sum, c_neg)
    beta = jnp.where(lump, 0.0, safe(pos_sum, c_pos))

    w = jnp.where(use, -(alpha[None] * neg + beta[None] * pos), 0.0)
    w = jnp.where(diag_eff[None] != 0,
                  w / jnp.where(diag_eff == 0, 1, diag_eff)[None], 0.0)

    # trilinear fallback for structurally-uncoupled points. All masks are
    # separable per-axis and built ON DEVICE — full-grid numpy literals
    # would be embedded in the HLO (gigabytes at 256³, see _geo_axis_tables)
    ev = _parity_vectors(shape, strides, 0)
    k_even = (ev[0].astype(jnp.int32)[:, None, None]
              + ev[1].astype(jnp.int32)[None, :, None]
              + ev[2].astype(jnp.int32)[None, None, :])
    tri = jnp.where(geo, (dt.type(0.5) ** k_even.astype(dt))[None],
                    dt.type(0.0))
    w = jnp.where((~geo_coupled & geo.any(axis=0))[None], tri, w)
    w = jnp.where((geo_coupled & ~has_strong_geo)[None], 0.0, w)
    w = jnp.where(weak_row[None], 0.0, w)

    odd = _parity_vectors(shape, strides, 1)
    c_mask = (odd[0][:, None, None] & odd[1][None, :, None]
              & odd[2][None, None, :])
    w = jnp.where(c_mask[None], 0.0, w)
    w = w.at[K_CENTER].set(jnp.where(c_mask, dt.type(1.0), w[K_CENTER]))
    return w


def _shift0_dev(arr, d):
    """out[i] = arr[i + d], zero-filled (jnp twin of boxmg._shift0)."""
    pads, slices = [], []
    for ax, dd in enumerate(d):
        n = arr.shape[ax]
        if dd >= 0:
            pads.append((0, dd))
            slices.append(slice(dd, dd + n))
        else:
            pads.append((-dd, 0))
            slices.append(slice(0, n))
    return jnp.pad(arr, pads)[tuple(slices)]


@functools.partial(jax.jit, static_argnames=("strides", "mrs"))
def interp_weights_boxmg_dev(s, theta, *, strides=(2, 2, 2), mrs=0.9):
    """jnp twin of boxmg.interp_weights_boxmg (θ traced).

    Same class-sequential construction (face → edge → center); all masks
    are separable per-axis outer products built on device (full-grid
    literals would overflow the remote-compile transport at 256³ — see
    _geo_axis_tables)."""
    from itertools import combinations, product

    shape = s.shape[1:]
    dt = s.dtype
    diag = s[K_CENTER]

    sign = jnp.where(diag > 0, dt.type(-1.0), dt.type(1.0))
    meas = (sign[None] * s).at[K_CENTER].set(0.0)
    row_max = jnp.maximum(meas, 0.0).max(axis=0)
    theta = jnp.asarray(theta).astype(dt)
    strong = (meas > 0) & (meas >= theta * row_max[None])
    strong = strong.at[K_CENTER].set(False)

    shat = jnp.where(strong, s, 0.0)
    offd = np.ones(27, dtype=bool)
    offd[K_CENTER] = False
    weak_sum = jnp.where(strong, 0.0, s)[offd].sum(axis=0)
    shat = shat.at[K_CENTER].set(diag + weak_sum)

    ev = _parity_vectors(shape, strides, 0)
    od = _parity_vectors(shape, strides, 1)
    # host-side twins of the tiny parity vectors, for static emptiness
    ev_h = [((np.arange(n) % 2) == 0) if st == 2 else np.zeros(n, bool)
            for n, st in zip(shape, strides)]
    od_h = [~v if st == 2 else np.ones(n, bool)
            for v, (n, st) in zip(ev_h, zip(shape, strides))]

    def axm(ax, v):
        return v.reshape([-1 if i == ax else 1 for i in range(3)])

    one = dt.type(1.0)
    c_mask = axm(0, od[0]) & axm(1, od[1]) & axm(2, od[2])
    zero_grid = jnp.zeros(shape, dtype=dt)
    # w as a per-direction dict of (nx, ny, nz) arrays: the class
    # substitutions touch ≤ 8 directions each, so dict accumulation
    # keeps traffic O(#contributions · n) — a (27, n) .at[].add would
    # copy the whole weight array per tap (gigabytes per setup at 128³)
    w = {K_CENTER: jnp.where(c_mask, one, 0.0)}

    axes2 = tuple(ax for ax in range(3) if strides[ax] == 2)
    for r in (1, 2, 3):
        for E in combinations(axes2, r):
            if not all((ev_h[ax] if ax in E else od_h[ax]).any()
                       for ax in range(3)):
                continue                      # class empty (static)
            m_e = (axm(0, ev[0] if 0 in E else od[0])
                   & axm(1, ev[1] if 1 in E else od[1])
                   & axm(2, ev[2] if 2 in E else od[2]))
            sc = {}
            for k, d in enumerate(DIRS):
                key = tuple(d[ax] if ax in E else 0 for ax in range(3))
                sc[key] = (sc[key] + shat[k]) if key in sc else shat[k]
            denom = sc[(0, 0, 0)]
            num = {}
            for dn, c in sc.items():
                if dn == (0, 0, 0):
                    continue
                e_j = tuple(ax for ax in E if dn[ax] == 0)
                if not e_j:
                    kk = dir_index(dn)
                    num[kk] = num.get(kk, 0.0) + (-c)
                    continue
                for signs in product((-1, 1), repeat=len(e_j)):
                    dp = [0, 0, 0]
                    for ax, sg in zip(e_j, signs):
                        dp[ax] = sg
                    kk = dir_index(tuple(dn[ax] + dp[ax]
                                         for ax in range(3)))
                    prev = w.get(dir_index(tuple(dp)))
                    if prev is None:
                        continue
                    num[kk] = num.get(kk, 0.0) + (
                        -c * _shift0_dev(prev, dn))
            inv_d = jnp.where(denom != 0,
                              one / jnp.where(denom == 0, one, denom), 0.0)
            for kk, v in num.items():
                w[kk] = jnp.where(m_e, v * inv_d, w.get(kk, zero_grid))

    if mrs < 1.0:
        weak_row = jnp.abs(s.sum(axis=0)) > dt.type(mrs) * jnp.abs(diag)
        keep = ~(weak_row & ~c_mask)
        w = {k: jnp.where(keep, v, 0.0) for k, v in w.items()}
    return jnp.stack([w.get(k, zero_grid) for k in range(27)])


# Above this many fine-grid points, rap_stencil_dev pre-relayouts its
# inputs parity-major: each of the ~1500 contraction terms otherwise
# reads a stride-2 slice of the minor (lane) axis, which costs a vector
# relayout PER TERM — measured 2.55 s of the 3.0 s warm 128³ device
# setup (bench/setup_profile_tpu.py, VERDICT r4 item 7). Small grids
# keep the direct slicing so existing small-shape executables (the tc3
# block chains, 17³/33³) stay byte-identical in .jax_cache.
_RAP_PARITY_MAJOR_MIN = 200_000


def _rap_pm_layout(a4, strides):
    """(27, P0, P1, P2) padded → (27, p0, p1, p2, H0, H1, H2): stride-2
    axes split into (half, parity) then parity axes moved out front, so
    every term of the RAP contraction reads a CONTIGUOUS block. Stride-1
    axes get parity dims of size 1."""
    shp = [a4.shape[0]]
    for ax, st in enumerate(strides):
        P = a4.shape[1 + ax]
        shp.extend([P // 2, 2] if st == 2 else [P, 1])
    x = a4.reshape(shp)                       # (K, H0,p0, H1,p1, H2,p2)
    return x.transpose(0, 2, 4, 6, 1, 3, 5)   # (K, p0,p1,p2, H0,H1,H2)


@functools.partial(jax.jit, static_argnames=("strides", "a_slots"))
def rap_stencil_dev(s, w, *, strides=(2, 2, 2), a_slots=None, w_left=None):
    """jnp twin of boxmg.rap_stencil; a_slots = static tuple of the A
    stencil slots that can be nonzero (all 27 when None). w_left: LEFT
    (restriction) weight stencil when it differs from w — the block
    path's P_ciᵀ A_{ci,cj} P_cj contractions (boxmg_block.py)."""
    shape = s.shape[1:]
    m = tuple(n // st for n, st in zip(shape, strides))
    tables = [_DJ_TABLE2 if st == 2 else _DJ_TABLE1 for st in strides]
    parity_major = int(np.prod(shape)) >= _RAP_PARITY_MAJOR_MIN
    # right-pad to even length on stride-2 axes for the parity reshape
    extra = tuple((n + 4) % 2 if (parity_major and st == 2) else 0
                  for n, st in zip(shape, strides))
    pad = ((0, 0),) + tuple((2, 2 + e) for e in extra)
    sp = jnp.pad(s, pad)
    wp = jnp.pad(w, pad)
    wlp = wp if w_left is None else jnp.pad(w_left, pad)
    if a_slots is None:
        a_slots = tuple(range(27))

    if parity_major:
        sp = _rap_pm_layout(sp, strides)
        wp = _rap_pm_layout(wp, strides)
        wlp = wp if w_left is None else _rap_pm_layout(wlp, strides)

        def sub(arr, k, t):
            idx, sls = [k], []
            for ax, st in enumerate(strides):
                s0 = 2 + (st - 1) + t[ax]
                idx.append(s0 % 2 if st == 2 else 0)
                b = s0 // 2 if st == 2 else s0
                sls.append(slice(b, b + m[ax]))
            return arr[tuple(idx) + tuple(sls)]
    else:
        def sub(arr, k, t):
            sl = tuple(
                slice(2 + (st - 1) + t[ax],
                      2 + (st - 1) + t[ax] + st * m[ax], st)
                for ax, st in enumerate(strides))
            return arr[(k,) + sl]

    acc = {k: jnp.zeros(m, dtype=s.dtype) for k in range(27)}
    for d1 in DIRS:
        # on stride-1 axes W is axis-diagonal: skip statically
        if any(st == 1 and d != 0 for st, d in zip(strides, d1)):
            continue
        k1 = dir_index((-d1[0], -d1[1], -d1[2]))
        w1 = sub(wlp, k1, d1)
        for ka in a_slots:
            da = DIRS[ka]
            wa = w1 * sub(sp, ka, d1)
            t2 = (d1[0] + da[0], d1[1] + da[1], d1[2] + da[2])
            for dx2, djx in tables[0][t2[0]]:
                for dy2, djy in tables[1][t2[1]]:
                    for dz2, djz in tables[2][t2[2]]:
                        if any(st == 1 and d != 0
                               for st, d in zip(strides, (djx, djy, djz))):
                            continue
                        kj = dir_index((djx, djy, djz))
                        kd = dir_index((dx2, dy2, dz2))
                        acc[kd] = acc[kd] + wa * sub(wp, kj, t2)
    return jnp.stack([acc[k] for k in range(27)])


@jax.jit
def level_stats_dev(s):
    """(inv_diag, inv_l1, λ_gershgorin) flat, on device."""
    diag = s[K_CENTER].reshape(-1)
    absum = jnp.abs(s).sum(axis=0).reshape(-1)
    inv_diag = jnp.where(diag != 0, 1.0 / jnp.where(diag == 0, 1, diag), 0.0)
    inv_l1 = jnp.where(absum != 0, 1.0 / jnp.where(absum == 0, 1, absum), 0.0)
    lam = jnp.max(absum * jnp.abs(inv_diag))
    return inv_diag, inv_l1, jnp.where(lam > 0, lam, 1.0)


@jax.jit
def stencil_matvec_dev(s, x):
    """y = A x on device (flat x), pad+slice shifts."""
    shape = s.shape[1:]
    nx, ny, nz = shape
    xp = jnp.pad(x.reshape(shape), 1)
    y = jnp.zeros(shape, dtype=x.dtype)
    for k, (dx, dy, dz) in enumerate(DIRS):
        y = y + s[k] * xp[1 + dx: 1 + dx + nx, 1 + dy: 1 + dy + ny,
                          1 + dz: 1 + dz + nz]
    return y.reshape(-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def lam_power_dev(s, inv_diag, iters: int = 12):
    """Power-iteration λ_max(D⁻¹A) with a fixed deterministic start,
    capped by the Gershgorin bound (host-path policy, device-side)."""
    n = inv_diag.shape[0]
    absum = jnp.abs(s).sum(axis=0).reshape(-1)
    gersh = jnp.max(absum * jnp.abs(inv_diag))
    gersh = jnp.where(gersh > 0, gersh, 1.0)
    x = jax.random.uniform(jax.random.PRNGKey(7), (n,),
                           dtype=inv_diag.dtype) - 0.5
    x = x / (jnp.linalg.norm(x) + 1e-30)
    lam = jnp.asarray(1.0, dtype=inv_diag.dtype)
    for _ in range(iters):
        y = inv_diag * stencil_matvec_dev(s, x)
        lam = jnp.linalg.norm(y)
        x = y / jnp.where(lam == 0, 1.0, lam)
    return jnp.where(lam == 0, 1.0, jnp.minimum(1.1 * lam, gersh))


@jax.jit
def axis_couplings_dev(s):
    """Σ|S_d| per axis over taps with d_ax ≠ 0 (choose_strides input)."""
    out = []
    for ax in range(3):
        mask = np.array([d[ax] != 0 for d in DIRS])
        out.append(jnp.abs(s[mask]).sum())
    return jnp.stack(out)


@jax.jit
def nnz_count_dev(s):
    return jnp.count_nonzero(s)


@functools.partial(jax.jit, static_argnames=("groups", "npad", "r"))
def _pack_dia(s, groups, npad, r):
    rows = []
    for g in groups:
        v = s[g[0]].reshape(-1)
        for k in g[1:]:
            v = v + s[k].reshape(-1)
        rows.append(jnp.pad(v, (0, npad)) if npad else v)
    return jnp.stack(rows).reshape(len(groups), r, 128)


def stencil_to_dia_dev(s, shape, slots=None):
    """Device (K, R, 128) DIA data + offsets from a device stencil
    (slot k → flat offset; collisions on tiny grids summed). `slots`
    restricts to the statically-known nonzero directions (level 0)."""
    nx, ny, nz = shape
    n = nx * ny * nz
    if slots is None:
        slots = range(27)
    flat_off = {}
    for k in slots:
        dx, dy, dz = DIRS[k]
        off = (dx * ny + dy) * nz + dz
        flat_off.setdefault(off, []).append(k)
    offs = sorted(flat_off)
    from ..sparse.dia import padded_rows

    r = padded_rows(n, 128)
    npad = r * 128 - n
    groups = tuple(tuple(flat_off[o]) for o in offs)
    return _pack_dia(s, groups, npad, r), tuple(offs)


@functools.partial(jax.jit, static_argnames=("n",))
def _dense_scatter(s, gather_idx, rows, cols, n):
    vals = s.reshape(-1)[gather_idx]
    dense = jnp.zeros((n, n), dtype=s.dtype)
    return dense.at[rows, cols].add(vals)


def dense_from_stencil_dev(s, shape):
    """Dense (n, n) matrix from a (small) device stencil — the coarse
    operator for the on-device inverse."""
    nx, ny, nz = shape
    n = nx * ny * nz
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    flat = (x * ny + y) * nz + z
    rows_l, cols_l, gidx_l = [], [], []
    for k, (dx, dy, dz) in enumerate(DIRS):
        xt, yt, zt = x + dx, y + dy, z + dz
        ok = ((xt >= 0) & (xt < nx) & (yt >= 0) & (yt < ny)
              & (zt >= 0) & (zt < nz))
        rows_l.append(flat[ok])
        cols_l.append(((xt * ny + yt) * nz + zt)[ok])
        gidx_l.append(k * n + flat[ok])
    return _dense_scatter(
        s, jnp.asarray(np.concatenate(gidx_l)),
        jnp.asarray(np.concatenate(rows_l)),
        jnp.asarray(np.concatenate(cols_l)), n)
