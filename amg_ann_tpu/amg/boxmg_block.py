"""Unknown-based structured AMG for vector (block) operators — tc3 fast path.

Extends the θ-sensitive all-banded machinery (amg/boxmg.py) to
vector-valued elasticity (reference testcase3-linear-elasticity): the
operator is a 27-point lattice stencil of nb×nb blocks,

    S[k, ci, cj][x, y, z] = A[(node, ci), (node + d_k, cj)],

dofs interleaved (node·nb + component) exactly like the reference's FEM
numbering (testcase3-…/src/main.cpp vector Q1 dof layout).

The coarsening is the UNKNOWN approach (hypre's nodal=0 default for
systems): each displacement component gets its own θ-filtered
operator-induced interpolation built from its diagonal block S[:, c, c],
so P = blockdiag(P_0, P_1, P_2) up to interleaving — and the Galerkin
product decomposes into nine SCALAR stencil contractions

    (A_c)_{ci,cj} = P_ciᵀ A_{ci,cj} P_cj

each computed with the existing stencil-algebra RAP (boxmg.rap_stencil
with w_left). All levels therefore stay 27-point block stencils.

Solve-side the block stencil is flattened to an ordinary SCALAR
interleaved-DIA matrix: the tap (d, ci→cj) lands on flat offset
nb·flat(d) + (cj − ci) (≤ 135 diagonals for nb = 3). Offsets from
different (d, e) pairs that collide (3·o + 2 = 3·(o+1) − 1) occupy
DISJOINT row strides (e = +2 only exists on ci = 0 rows, e = −1 only on
ci ∈ {1,2}), so accumulation is exact. The whole existing DIA kernel
stack — Pallas SpMV, fused smoother steps, multi-step Chebyshev sweeps —
then applies unchanged.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.csr import CSR
from .boxmg import (DIRS, K_CENTER, interp_weights, interp_weights_boxmg,
                    rap_stencil,
                    strides_from_couplings)
from .hierarchy import AMGParams, HierarchyStats


def csr_to_block_stencil(a: CSR, shape, nb: int = 3) -> np.ndarray | None:
    """(27, nb, nb, nx, ny, nz) block stencil for an interleaved vector
    matrix on node grid `shape`, or None if any coupling reaches beyond
    the 3³ node neighborhood (degree ≥ 2 FEM)."""
    nx, ny, nz = shape
    assert a.nrows == nb * nx * ny * nz, (a.nrows, nb, shape)
    rows, cols, vals = a.row_expand()
    node_r, ci = np.divmod(rows.astype(np.int64), nb)
    node_c, cj = np.divmod(cols.astype(np.int64), nb)
    xr, rem = np.divmod(node_r, ny * nz)
    yr, zr = np.divmod(rem, nz)
    xc, rem = np.divmod(node_c, ny * nz)
    yc, zc = np.divmod(rem, nz)
    dx, dy, dz = xc - xr, yc - yr, zc - zr
    if (np.abs(dx).max(initial=0) > 1 or np.abs(dy).max(initial=0) > 1
            or np.abs(dz).max(initial=0) > 1):
        return None
    k = ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)
    s = np.zeros((27, nb, nb, nx, ny, nz), dtype=a.data.dtype)
    s[k, ci, cj, xr, yr, zr] = vals
    return s


def block_stencil_to_csr(s: np.ndarray) -> CSR:
    """Interleaved CSR from a block stencil (zero entries dropped)."""
    _, nb, _, nx, ny, nz = s.shape
    n = nx * ny * nz
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    node = (x * ny + y) * nz + z
    rows_l, cols_l, vals_l = [], [], []
    for k, (dx, dy, dz) in enumerate(DIRS):
        xt, yt, zt = x + dx, y + dy, z + dz
        inb = ((xt >= 0) & (xt < nx) & (yt >= 0) & (yt < ny)
               & (zt >= 0) & (zt < nz))
        tgt = (xt * ny + yt) * nz + zt
        for ci in range(nb):
            for cj in range(nb):
                sk = s[k, ci, cj]
                m = (sk != 0)
                if not m.any():
                    continue
                assert inb[m].all(), "stencil entry outside the grid"
                rows_l.append(node[m] * nb + ci)
                cols_l.append(tgt[m] * nb + cj)
                vals_l.append(sk[m])
    if not rows_l:
        return CSR.from_coo([], [], [], (nb * n, nb * n))
    return CSR.from_coo(np.concatenate(rows_l), np.concatenate(cols_l),
                        np.concatenate(vals_l), (nb * n, nb * n))


def block_stencil_matvec(s: np.ndarray, x: np.ndarray) -> np.ndarray:
    """y = A x host-side; x flat interleaved (nb·n)."""
    _, nb, _, nx, ny, nz = s.shape
    x4 = x.reshape(nx, ny, nz, nb)
    xp = np.pad(x4, ((1, 1), (1, 1), (1, 1), (0, 0)))
    y = np.zeros((nx, ny, nz, nb), dtype=np.result_type(s, x))
    for k, (dx, dy, dz) in enumerate(DIRS):
        blk = s[k]
        if not np.any(blk):
            continue
        xs = xp[1 + dx: 1 + dx + nx, 1 + dy: 1 + dy + ny,
                1 + dz: 1 + dz + nz]
        # y[..., ci] += Σ_cj blk[ci, cj] ⊙ xs[..., cj]
        y += np.einsum("ijxyz,xyzj->xyzi", blk, xs)
    return y.reshape(-1)


def block_diag_stats(s: np.ndarray):
    """(inv_diag, inv_l1, Gershgorin λ_max bound) flat interleaved."""
    _, nb, _, nx, ny, nz = s.shape
    diag = np.stack([s[K_CENTER, c, c] for c in range(nb)],
                    axis=-1).reshape(-1)
    absum = np.abs(s).sum(axis=(0, 2))           # (nb, nx, ny, nz)
    absum = np.moveaxis(absum, 0, -1).reshape(-1)
    inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
    inv_l1 = np.where(absum != 0, 1.0 / np.where(absum == 0, 1, absum), 0.0)
    lam = float(np.max(absum * np.abs(inv_diag))) if diag.size else 1.0
    return inv_diag, inv_l1, (lam if lam > 0 else 1.0)


def block_lam_max(s: np.ndarray, inv_diag: np.ndarray, iters: int = 12,
                  seed: int = 7, big_n: int = 100_000) -> float:
    """λ_max(D⁻¹A) estimate — boxmg.stencil_lam_max policy, block-native."""
    n = inv_diag.size
    absum_flat = np.moveaxis(np.abs(s).sum(axis=(0, 2)), 0, -1).reshape(-1)
    gersh = float(np.max(absum_flat * np.abs(inv_diag))) if n else 1.0
    if n > big_n:
        return gersh if gersh > 0 else 1.0
    rng = np.random.default_rng(seed)
    x = rng.random(n) - 0.5
    x /= np.linalg.norm(x) + 1e-300
    lam = 1.0
    for _ in range(iters):
        y = inv_diag * block_stencil_matvec(s, x)
        lam = float(np.linalg.norm(y))
        if lam == 0.0:
            return 1.0
        x = y / lam
    return min(1.1 * lam, gersh if gersh > 0 else 1.1 * lam)


def block_stencil_to_dia(s: np.ndarray, dtype=None, cols: int = 128,
                         keep_all_slots: bool = False):
    """Scalar interleaved DIA straight from the block stencil.

    Offset of tap (d, ci→cj): nb·((dx·ny + dy)·nz + dz) + (cj − ci).
    Collisions between (d, e=cj−ci) pairs land on disjoint row strides
    (module docstring) and accumulate exactly. keep_all_slots carries
    structurally-possible zero (k, ci, cj) slots so Galerkin levels of a
    θ-sweep share one offsets tuple (stable jit cache keys)."""
    from ..sparse.dia import DIA

    _, nb, _, nx, ny, nz = s.shape
    n = nx * ny * nz
    nd = nb * n
    if dtype is None:
        dtype = s.dtype
    flat = {}
    nnz = 0
    for k, (dx, dy, dz) in enumerate(DIRS):
        node_off = (dx * ny + dy) * nz + dz
        struct_ct = (nx - abs(dx)) * (ny - abs(dy)) * (nz - abs(dz))
        for ci in range(nb):
            for cj in range(nb):
                sk = s[k, ci, cj]
                if not (keep_all_slots or np.any(sk)):
                    continue
                nnz += struct_ct
                off = nb * node_off + (cj - ci)
                acc = flat.setdefault(off, np.zeros(nd, dtype=dtype))
                acc[ci::nb] += sk.reshape(-1).astype(dtype)
    offs = sorted(flat)
    from ..sparse.dia import padded_rows

    r = padded_rows(nd, cols)
    data = np.zeros((max(len(offs), 1), r * cols), dtype=dtype)
    for i, o in enumerate(offs):
        data[i, :nd] = flat[o]
    return DIA(data=jnp.asarray(data.reshape(-1, r, cols)),
               offsets=tuple(offs) or (0,), n=nd, nnz=nnz)


def choose_strides_block(s: np.ndarray, theta: float) -> tuple:
    """θ-driven semicoarsening decision on the summed block magnitudes
    (boxmg.choose_strides semantics; one shared coarse lattice for all
    components keeps P block-diagonal)."""
    shape = s.shape[3:]
    coup = np.zeros(3)
    for k, d in enumerate(DIRS):
        ab = float(np.abs(s[k]).sum())
        for ax in range(3):
            if d[ax] != 0:
                coup[ax] += ab
    return strides_from_couplings(coup, theta, shape)


# -- device-side setup (jitted; tc3 θ-sweeps at device speed) ----------------

def _bdia_groups(shape, nb, slots=None):
    """Static (offset → ((k, ci, cj), …)) map for the interleaved DIA.
    slots: optional restriction to (k, ci, cj) triples that can be
    nonzero (level 0); None = all structurally-possible slots."""
    nx, ny, nz = shape
    flat_off = {}
    it = (slots if slots is not None
          else [(k, ci, cj) for k in range(27)
                for ci in range(nb) for cj in range(nb)])
    for (k, ci, cj) in it:
        dx, dy, dz = DIRS[k]
        off = nb * ((dx * ny + dy) * nz + dz) + (cj - ci)
        flat_off.setdefault(off, []).append((k, ci, cj))
    offs = sorted(flat_off)
    return offs, tuple(tuple(flat_off[o]) for o in offs)


def block_stencil_to_dia_dev(s, shape, nb: int = 3, slots=None):
    """Device (K, R, 128) interleaved DIA data + offsets from a device
    block stencil (jnp twin of block_stencil_to_dia)."""
    import functools as _ft

    import jax as _jax

    from ..sparse.dia import padded_rows

    offs, groups = _bdia_groups(shape, nb, slots)
    n = int(np.prod(shape))
    nd = nb * n
    r = padded_rows(nd, 128)
    npad = r * 128 - nd

    @_ft.partial(_jax.jit, static_argnames=("groups", "npad", "r", "nb"))
    def pack(s, groups, npad, r, nb):
        rows = []
        for g in groups:
            comp = [None] * nb
            for (k, ci, cj) in g:
                v = s[k, ci, cj].reshape(-1)
                comp[ci] = v if comp[ci] is None else comp[ci] + v
            zero = jnp.zeros(s.shape[3:], dtype=s.dtype).reshape(-1)
            cols = [c if c is not None else zero for c in comp]
            v = jnp.stack(cols, axis=1).reshape(-1)   # interleave
            rows.append(jnp.pad(v, (0, npad)) if npad else v)
        return jnp.stack(rows).reshape(len(groups), r, 128)

    return pack(s, groups, npad, r, nb), tuple(offs)


# lazily-built jit of _setup_block_chain_dev_impl (module-level so the
# jit cache persists across setup calls — a per-call jit would retrace)
_BLOCK_CHAIN_JIT = None


def _axis_couplings_block_dev(s):
    out = []
    for ax in range(3):
        mask = np.array([d[ax] != 0 for d in DIRS])
        out.append(jnp.abs(s[mask]).sum())
    return jnp.stack(out)


def _block_stats_dev(s):
    nbl = s.shape[1]
    diag = jnp.stack([s[K_CENTER, c, c] for c in range(nbl)],
                     axis=-1).reshape(-1)
    absum = jnp.moveaxis(jnp.abs(s).sum(axis=(0, 2)), 0, -1).reshape(-1)
    inv_diag = jnp.where(diag != 0,
                         1.0 / jnp.where(diag == 0, 1, diag), 0.0)
    inv_l1 = jnp.where(absum != 0,
                       1.0 / jnp.where(absum == 0, 1, absum), 0.0)
    lam = jnp.max(absum * jnp.abs(inv_diag))
    return inv_diag, inv_l1, jnp.where(lam > 0, lam, 1.0)


def _setup_block_chain_dev_impl(s0, theta, *, shape, nb, slots, interp,
                                mrs, schedule, max_coarse):
    from ..sparse.dia import DIA
    from .boxmg_device import (interp_weights_boxmg_dev, interp_weights_dev,
                               nnz_count_dev, rap_stencil_dev)
    from .structured_mg import BlockStructuredLevel
    from .transfer import coarse_size

    interp_dev = (interp_weights_boxmg_dev if interp == "boxmg"
                  else interp_weights_dev)
    stencils, weights = [s0], []
    shapes = [tuple(shape)]
    coup_devs = []
    for strides in schedule:
        coup_devs.append(_axis_couplings_block_dev(stencils[-1]))
        if strides is None:          # scheduled stop (verified by caller)
            break
        s_l = stencils[-1]
        ws = [interp_dev(s_l[:, c, c], theta, strides=strides, mrs=mrs)
              for c in range(nb)]
        s_c = jnp.stack([jnp.stack([
            rap_stencil_dev(s_l[:, ci, cj], ws[cj], strides=strides,
                            w_left=None if ci == cj else ws[ci])
            for cj in range(nb)], axis=1)
            for ci in range(nb)], axis=1)
        w_s = jnp.stack(ws)
        # materialize (A_c, W) per level: without this barrier XLA fuses
        # the DIA-pack bands into their producers and recomputes the
        # interp/RAP expressions per band (see the scalar chain,
        # structured_mg._setup_chain_dev — 14× measured on r5 bisect)
        s_c, w_s = jax.lax.optimization_barrier((s_c, w_s))
        stencils.append(s_c)
        weights.append(w_s)
        shapes.append(tuple(coarse_size(s) if st == 2 else s
                            for s, st in zip(shapes[-1], strides)))

    stride_real = [st for st in schedule if st is not None]
    levels, nnz_dev = [], []
    for l, (s_l, sh) in enumerate(zip(stencils, shapes)):
        inv_diag, inv_l1, lam = _block_stats_dev(s_l)
        if nb * int(np.prod(sh)) <= 100_000:
            lam = _lam_power_block_dev(s_l, inv_diag)
        data, offs = block_stencil_to_dia_dev(
            s_l, sh, nb=nb, slots=slots if l == 0 else None)
        has_next = l < len(stencils) - 1
        levels.append(BlockStructuredLevel(
            a=DIA(data=data, offsets=offs, n=nb * int(np.prod(sh)),
                  nnz=0),
            inv_diag=inv_diag, inv_l1=inv_l1, lam_max=lam,
            shape=sh, nb=nb,
            p_w=weights[l] if has_next else None,
            strides=stride_real[l] if has_next else (2, 2, 2),
        ))
        nnz_dev.append(nnz_count_dev(s_l))
    coarse = _dense_from_block_stencil_dev(stencils[-1], shapes[-1], nb)
    return (tuple(stencils), tuple(weights), tuple(levels),
            tuple(coup_devs), tuple(nnz_dev), jnp.linalg.inv(coarse))


def setup_structured_block_device(s0_dev, grid_shape, params: AMGParams,
                                  dtype, nb: int = 3, slots=None):
    """θ-sensitive block setup ON DEVICE as ONE jitted launch per (shape,
    schedule): strength filtering, the nine per-pair RAP contractions,
    stats, DIA packing and the dense coarse inverse all run inside one
    executable with θ traced (the scalar _setup_chain_dev pattern,
    structured_mg.py, lifted to vector operators). The stride schedule is
    speculative (full coarsening first) and corrected from ONE combined
    coupling/nnz fetch per attempt — round 3 dispatched ~10 executables
    per level eagerly, which cost ~10 s per warm setup through the axon
    tunnel and dominated the tc3 datagen (~30 s per θ)."""
    import functools as _ft
    import time as _time

    import jax as _jax

    from .boxmg import strides_from_couplings
    from .structured_mg import StructuredHierarchy, StructuredSetupResult
    from .transfer import coarse_size

    global _BLOCK_CHAIN_JIT
    if _BLOCK_CHAIN_JIT is None:
        _BLOCK_CHAIN_JIT = _jax.jit(
            _setup_block_chain_dev_impl,
            static_argnames=("shape", "nb", "slots", "interp", "mrs",
                             "schedule", "max_coarse"))

    t0 = _time.perf_counter()
    theta = params.strong_threshold
    theta_t = jnp.asarray(theta, dtype=s0_dev.dtype)
    shape0 = tuple(int(x) for x in grid_shape)

    def apply_st(sh, st):
        return tuple(coarse_size(s) if t == 2 else s
                     for s, t in zip(sh, st))

    def full_schedule(prefix):
        sched = list(prefix)
        sh = shape0
        for st in sched:
            sh = apply_st(sh, st)
        while (nb * int(np.prod(sh)) > params.max_coarse_size
               and len(sched) + 1 < params.max_levels and max(sh) >= 2):
            st = tuple(2 if n >= 2 else 1 for n in sh)
            if 2 not in st:
                break
            sched.append(st)
            sh = apply_st(sh, st)
        return tuple(sched)

    schedule = full_schedule([])
    for _attempt in range(params.max_levels + 2):
        (stencils, weights, levels, coup_devs, nnz_dev,
         coarse_inv) = _BLOCK_CHAIN_JIT(
            s0_dev, theta_t, shape=shape0, nb=nb,
            slots=tuple(slots) if slots is not None else None,
            interp=params.structured_interp, mrs=params.max_row_sum,
            schedule=schedule, max_coarse=params.max_coarse_size)
        coups, nnz_host = _jax.device_get((coup_devs, nnz_dev))
        shapes = [shape0]
        for st in schedule:
            if st is None:
                break
            shapes.append(apply_st(shapes[-1], st))
        bad = want_bad = None
        for l, c in enumerate(coups):
            want = strides_from_couplings(np.asarray(c), theta, shapes[l])
            if want is not None and 2 not in want:
                want = None
            sched_l = schedule[l] if l < len(schedule) else None
            if want != sched_l:
                bad, want_bad = l, want
                break
        if bad is None:
            break
        prefix = list(schedule[:bad])
        schedule = (tuple(prefix) + (None,) if want_bad is None
                    else full_schedule(prefix + [want_bad]))
    stride_list = [st for st in schedule if st is not None]
    shapes = [shape0]
    for st in stride_list:
        shapes.append(apply_st(shapes[-1], st))
    stencils, weights, levels = list(stencils), list(weights), list(levels)
    nnz = [int(v) for v in nnz_host]
    rows = [nb * int(np.prod(sh)) for sh in shapes]
    p_nnz_est = sum(int(np.prod(w.shape)) for w in weights)
    stats = HierarchyStats(
        n_levels=len(stencils), rows=rows, nnz=nnz,
        sparsity=[z / max(r, 1) for z, r in zip(nnz, rows)],
        grid_complexity=sum(rows) / max(rows[0], 1),
        operator_complexity=sum(nnz) / max(nnz[0], 1),
        memory_complexity=(sum(nnz) + p_nnz_est) / max(nnz[0], 1),
    )
    device = StructuredHierarchy(levels=tuple(levels),
                                 coarse_inv=coarse_inv,
                                 params=params.solve_view())
    stats.t_setup = _time.perf_counter() - t0
    return StructuredSetupResult(device, stats, params,
                                 block_stencils=stencils,
                                 weights=weights, strides=stride_list)


import functools as _functools

import jax as _jax_mod


@_jax_mod.jit
def _block_stencil_matvec_dev(s, x):
    _, nb, _, nx, ny, nz = s.shape
    x4 = x.reshape(nx, ny, nz, nb)
    xp = jnp.pad(x4, ((1, 1), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((nx, ny, nz, nb), dtype=x.dtype)
    for k, (dx, dy, dz) in enumerate(DIRS):
        xs = xp[1 + dx: 1 + dx + nx, 1 + dy: 1 + dy + ny,
                1 + dz: 1 + dz + nz]
        y = y + jnp.einsum("ijxyz,xyzj->xyzi", s[k], xs)
    return y.reshape(-1)


@_functools.partial(_jax_mod.jit, static_argnames=("iters",))
def _lam_power_block_dev(s, inv_diag, iters: int = 12):
    n = inv_diag.shape[0]
    absum = jnp.moveaxis(jnp.abs(s).sum(axis=(0, 2)), 0, -1).reshape(-1)
    gersh = jnp.max(absum * jnp.abs(inv_diag))
    gersh = jnp.where(gersh > 0, gersh, 1.0)
    x = _jax_mod.random.uniform(_jax_mod.random.PRNGKey(7), (n,),
                                dtype=inv_diag.dtype) - 0.5
    x = x / (jnp.linalg.norm(x) + 1e-30)
    lam = jnp.asarray(1.0, dtype=inv_diag.dtype)
    for _ in range(iters):
        y = inv_diag * _block_stencil_matvec_dev(s, x)
        lam = jnp.linalg.norm(y)
        x = y / jnp.where(lam == 0, 1.0, lam)
    return jnp.where(lam == 0, 1.0, jnp.minimum(1.1 * lam, gersh))


@_functools.partial(_jax_mod.jit, static_argnames=("n", "nb"))
def _dense_scatter_block(s, gather_idx, rows, cols, n, nb):
    vals = s.reshape(-1)[gather_idx]
    dense = jnp.zeros((nb * n, nb * n), dtype=s.dtype)
    return dense.at[rows, cols].add(vals)


def _dense_from_block_stencil_dev(s, shape, nb):
    nx, ny, nz = shape
    n = nx * ny * nz
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    flat = (x * ny + y) * nz + z
    rows_l, cols_l, gidx_l = [], [], []
    stride_k = nb * nb * n
    for k, (dx, dy, dz) in enumerate(DIRS):
        xt, yt, zt = x + dx, y + dy, z + dz
        ok = ((xt >= 0) & (xt < nx) & (yt >= 0) & (yt < ny)
              & (zt >= 0) & (zt < nz))
        src = flat[ok]
        tgt = ((xt * ny + yt) * nz + zt)[ok]
        for ci in range(nb):
            for cj in range(nb):
                rows_l.append(src * nb + ci)
                cols_l.append(tgt * nb + cj)
                gidx_l.append(k * stride_k + (ci * nb + cj) * n + src)
    return _dense_scatter_block(
        s, jnp.asarray(np.concatenate(gidx_l)),
        jnp.asarray(np.concatenate(rows_l)),
        jnp.asarray(np.concatenate(cols_l)), n, nb)


def setup_structured_block(a: CSR, grid_shape, params: AMGParams,
                           dtype, nb: int = 3, device_setup=None,
                           stencil=None, slots=None):
    """Build the all-banded block hierarchy (θ-sensitive).

    Returns a StructuredSetupResult whose device hierarchy carries
    BlockStructuredLevel levels (structured_mg.py); the V-cycle applies
    per-component weighted transfers and the interleaved-DIA operators.

    device_setup: run the jitted setup (setup_structured_block_device) —
    defaults to True on TPU backends, where a θ-sweep then reuses one
    compiled setup per shape. stencil: precomputed (27, nb, nb, …) block
    stencil (numpy or device array) so sweeps upload the operator once."""
    import jax as _jax

    from .structured_mg import (BlockStructuredLevel, StructuredHierarchy,
                                StructuredSetupResult, _dense_inverse)
    from .transfer import coarse_size

    t0 = time.perf_counter()
    if stencil is not None:
        s0 = stencil
    else:
        s0 = csr_to_block_stencil(a, grid_shape, nb)
    assert s0 is not None, (
        "operator reaches beyond the 3^3 node neighborhood "
        "(degree >= 2 FEM) - block structured path needs degree 1")
    if device_setup is None:
        device_setup = (isinstance(s0, _jax.Array)
                        or _jax.default_backend() in ("tpu", "axon"))
    if device_setup:
        if slots is None and isinstance(s0, np.ndarray):
            slots = tuple((k, ci, cj) for k in range(27)
                          for ci in range(nb) for cj in range(nb)
                          if np.any(s0[k, ci, cj]))
        s_dev = jnp.asarray(s0, dtype=dtype)
        return setup_structured_block_device(s_dev, grid_shape, params,
                                             dtype, nb=nb, slots=slots)
    s0 = np.asarray(s0)
    if s0.dtype != np.dtype(dtype):
        s0 = s0.astype(dtype)
    theta = params.strong_threshold

    stencils = [s0]
    weights = []           # per level: (nb, 27, nx, ny, nz) stacks
    stride_list = []
    shapes = [tuple(grid_shape)]
    while (nb * int(np.prod(shapes[-1])) > params.max_coarse_size
           and len(stencils) < params.max_levels
           and max(shapes[-1]) >= 2):
        s_l = stencils[-1]
        strides = choose_strides_block(s_l, theta)
        if 2 not in strides:
            break
        interp_host = (interp_weights_boxmg
                       if params.structured_interp == "boxmg"
                       else interp_weights)
        ws = np.stack([
            interp_host(np.ascontiguousarray(s_l[:, c, c]), theta,
                        params.max_row_sum, strides)
            for c in range(nb)])
        m = tuple(n // st for n, st in zip(shapes[-1], strides))
        s_c = np.zeros((27, nb, nb) + m, dtype=dtype)
        for ci in range(nb):
            for cj in range(nb):
                s_c[:, ci, cj] = rap_stencil(
                    np.ascontiguousarray(s_l[:, ci, cj]), ws[cj], strides,
                    w_left=None if ci == cj else ws[ci])
        stencils.append(s_c)
        weights.append(ws)
        stride_list.append(strides)
        shapes.append(tuple(coarse_size(s) if st == 2 else s
                            for s, st in zip(shapes[-1], strides)))

    rows = [nb * int(np.prod(sh)) for sh in shapes]
    nnz = [int(np.count_nonzero(s)) for s in stencils]
    p_nnz = sum(int(np.count_nonzero(w)) for w in weights)
    stats = HierarchyStats(
        n_levels=len(stencils), rows=rows, nnz=nnz,
        sparsity=[z / max(r, 1) for z, r in zip(nnz, rows)],
        grid_complexity=sum(rows) / max(rows[0], 1),
        operator_complexity=sum(nnz) / max(nnz[0], 1),
        memory_complexity=(sum(nnz) + p_nnz) / max(nnz[0], 1),
    )

    levels = []
    for l, (s_l, shape) in enumerate(zip(stencils, shapes)):
        inv_diag, inv_l1, _ = block_diag_stats(s_l)
        lam = block_lam_max(s_l, inv_diag)
        has_next = l < len(stencils) - 1
        levels.append(BlockStructuredLevel(
            a=block_stencil_to_dia(s_l, dtype=dtype, keep_all_slots=(l > 0)),
            inv_diag=jnp.asarray(inv_diag, dtype=dtype),
            inv_l1=jnp.asarray(inv_l1, dtype=dtype),
            lam_max=jnp.asarray(lam, dtype=dtype),
            shape=shape, nb=nb,
            p_w=jnp.asarray(weights[l], dtype=dtype) if has_next else None,
            strides=stride_list[l] if has_next else (2, 2, 2),
        ))
    coarse_inv = _dense_inverse(block_stencil_to_csr(stencils[-1]))
    device = StructuredHierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
        params=params.solve_view(),
    )
    stats.t_setup = time.perf_counter() - t0
    return StructuredSetupResult(device, stats, params,
                                 block_stencils=stencils,
                                 weights=weights, strides=stride_list)
