"""Distributed structured V-cycle: shard_map + explicit halo exchange.

The TPU-native replacement for the reference's (disabled) PETSc MPI layer
on the fast path (SURVEY.md §2.3/§7.8): every fine level of the
structured hierarchy is 1-D partitioned into contiguous x-slabs over a
`jax.sharding.Mesh`; the ENTIRE AMG-PCG solve runs inside one shard_map —

  * operator application: HaloDIA (dist/halo.py) — two ppermutes exchange
    max|offset| flat entries with the ring neighbors, local shifted
    multiply-add does the rest; XLA's async collectives overlap the
    exchange with the diagonal-block compute;
  * smoothing: the very same residual-carrying smooth_rx recurrence as
    the single-device path (solvers/smoothers.py) — op_matvec dispatches
    on HaloDIA, so the halo exchange lives inside the cycle;
  * transfers: operator-induced weighted restriction/prolongation on the
    local 3-D slab. With an even x-slab width, restriction needs exactly
    ONE plane from the right neighbor (of W ⊙ r — the residual plane is
    exchanged at runtime, the θ-dependent weight plane is pre-sliced at
    setup), and prolongation exactly one coarse plane from the left;
  * Krylov scalars: psum-reducing inner products (solvers/krylov.pcg's
    `dot` hook);
  * coarse tail: once a level is too small to shard (nx not divisible,
    odd slab, x-axis semicoarsened, or halo exceeding the slab), the
    restricted residual is all-gathered ONCE and the remaining levels run
    replicated — bit-identical on every device, zero further
    communication until the correction is sliced back.

Multi-host: the same code over a mesh from jax.distributed.initialize()
(dist/multihost.py) — ppermutes ride ICI within hosts and DCN across.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..amg.structured_mg import (StructuredHierarchy, StructuredLevel,
                                 StructuredSetupResult)
from ..amg.transfer import _interleave, restrict_w
from ..solvers.cycle import vcycle
from ..solvers.krylov import PCGResult, pcg
from ..solvers.ops import op_matvec
from ..solvers.smoothers import smooth_rx
from .halo import HaloDIA, maybe_all_gather, maybe_ppermute

AXIS = "rows"


@struct.dataclass
class ShardedLevel:
    """One x-slab-partitioned level. Outside shard_map the arrays are the
    sharded GLOBAL arrays (p_w_halo carries a per-device leading block
    axis); inside, each device sees its local block."""

    a: HaloDIA
    inv_diag: jax.Array                  # (n_loc,) inside
    inv_l1: jax.Array
    lam_max: jax.Array                   # replicated scalar
    p_w_halo: jax.Array                  # (27, ndev, nx_loc+1, ny, nz)
    shape: tuple = struct.field(pytree_node=False)        # GLOBAL shape
    strides: tuple = struct.field(pytree_node=False)


@struct.dataclass
class DistStructuredHierarchy:
    sharded: tuple                       # tuple[ShardedLevel]
    tail: StructuredHierarchy            # replicated coarse levels
    ndev: int = struct.field(pytree_node=False)


def _flat_dia(level: StructuredLevel):
    """(K, n) flat coefficient array + offsets from the level's DIA
    (alignment tail rows sliced off — they are all-zero)."""
    a = level.a
    data = a.data.reshape(a.data.shape[0], -1)
    assert data.shape[1] >= a.n
    return data[:, :a.n], a.offsets


def shardable_levels(h: StructuredSetupResult, ndev: int) -> int:
    """Number of leading hierarchy levels that partition into x-slabs."""
    s = 0
    for lev in h.device.levels[:-1]:
        nx, ny, nz = lev.shape
        n = nx * ny * nz
        if (nx % ndev or n % 128 or lev.p_w is None
                or lev.strides[0] != 2):
            break
        nxl = nx // ndev
        halo = max(abs(int(o)) for o in lev.a.offsets)
        if nxl < 2 or nxl % 2 or halo > nxl * ny * nz:
            break
        s += 1
    return s


def shard_structured_hierarchy(h: StructuredSetupResult, mesh: Mesh,
                               axis: str = AXIS) -> DistStructuredHierarchy:
    """Place a host-built structured hierarchy on the mesh: x-slab
    sharding for the leading levels, full replication for the tail."""
    ndev = mesh.shape[axis]
    n_shard = shardable_levels(h, ndev)
    assert n_shard >= 1, (
        "level 0 is not shardable over this mesh (need nx % ndev == 0, "
        "even slabs, flat DIA layout)")

    sh_vec = NamedSharding(mesh, P(axis))
    sh_mat = NamedSharding(mesh, P(None, axis))
    sh_w = NamedSharding(mesh, P(None, axis, None, None, None))
    repl = NamedSharding(mesh, P())

    sharded = []
    for lev in h.device.levels[:n_shard]:
        nx, ny, nz = lev.shape
        data, offsets = _flat_dia(lev)
        halo = max(abs(int(o)) for o in offsets)
        # weights with their +1 x-halo (right neighbor's first plane; zero
        # past the global end), pre-sliced per device at setup — they are
        # static per hierarchy, so no runtime exchange is ever needed
        w = np.asarray(lev.p_w)
        wp = np.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))
        nxl = nx // ndev
        blocks = np.stack([wp[:, d * nxl: d * nxl + nxl + 1]
                           for d in range(ndev)], axis=1)
        sharded.append(ShardedLevel(
            a=HaloDIA(
                data=jax.device_put(data, sh_mat),
                offsets=offsets, axis=axis, halo=halo, ndev=ndev),
            inv_diag=jax.device_put(lev.inv_diag, sh_vec),
            inv_l1=jax.device_put(lev.inv_l1, sh_vec),
            lam_max=jax.device_put(lev.lam_max, repl),
            p_w_halo=jax.device_put(jnp.asarray(blocks), sh_w),
            shape=lev.shape,
            strides=lev.strides,
        ))
    tail = StructuredHierarchy(
        levels=tuple(jax.device_put(lev, repl)
                     for lev in h.device.levels[n_shard:]),
        coarse_inv=jax.device_put(h.device.coarse_inv, repl),
        params=h.params,
    )
    return DistStructuredHierarchy(sharded=tuple(sharded), tail=tail,
                                   ndev=ndev)


def _hierarchy_specs(dh: DistStructuredHierarchy) -> DistStructuredHierarchy:
    """A matching pytree of PartitionSpecs for shard_map in_specs."""
    def spec_level(lev: ShardedLevel) -> ShardedLevel:
        return ShardedLevel(
            a=HaloDIA(data=P(None, AXIS), offsets=lev.a.offsets,
                      axis=lev.a.axis, halo=lev.a.halo, ndev=lev.a.ndev),
            inv_diag=P(AXIS), inv_l1=P(AXIS), lam_max=P(),
            p_w_halo=P(None, AXIS, None, None, None),
            shape=lev.shape, strides=lev.strides)

    tail = jax.tree.map(lambda _: P(), dh.tail)
    return DistStructuredHierarchy(
        sharded=tuple(spec_level(l) for l in dh.sharded),
        tail=tail, ndev=dh.ndev)


# -- local (inside-shard_map) transfer operators ----------------------------
def _ring(ndev, direction):
    if direction > 0:
        return [(i, (i + 1) % ndev) for i in range(ndev)]
    return [(i, (i - 1) % ndev) for i in range(ndev)]


def _restrict_local(r_loc, lev: ShardedLevel, axis: str):
    """Local coarse slab of xc = Pᵀ r.

    Appends the right neighbor's first residual plane (one ppermute) and
    runs the weighted restriction on the (nxl+1)-plane slab: its odd
    x-positions are exactly this device's coarse planes (even slabs ⇒
    local parity == global parity). Ring wrap at the global end delivers
    device 0's plane to the last device — annihilated by the zero weight
    halo there."""
    nx, ny, nz = lev.shape
    ndev = lev.a.ndev
    nxl = nx // ndev
    r3 = r_loc.reshape(nxl, ny, nz)
    right = maybe_ppermute(r3[:1], axis, _ring(ndev, -1))
    r_ext = jnp.concatenate([r3, right], axis=0)         # (nxl+1, ny, nz)
    w_loc = lev.p_w_halo[:, 0]                           # (27, nxl+1, ny, nz)
    return restrict_w(r_ext.reshape(-1), w_loc, (nxl + 1, ny, nz),
                      lev.strides)


def _prolongate_local(c_loc, lev: ShardedLevel, axis: str):
    """Local fine slab of P xc.

    Needs the left neighbor's LAST coarse plane (one ppermute): the first
    local fine plane (global even x) interpolates from the coarse point
    just across the slab boundary. Builds the injected coarse field on an
    extended (nxl+2)-plane x-axis and contracts with the local weights."""
    nx, ny, nz = lev.shape
    sy, sz = lev.strides[1], lev.strides[2]
    ndev = lev.a.ndev
    nxl = nx // ndev
    mxl = nxl // 2
    my = ny // 2 if sy == 2 else ny
    mz = nz // 2 if sz == 2 else nz
    c3 = c_loc.reshape(mxl, my, mz)
    left = maybe_ppermute(c3[-1:], axis, _ring(ndev, +1))
    # wrap garbage reaching device 0 is annihilated: its first fine plane
    # is global x=0, whose dx=-1 weights are zero (boundary) by geo mask
    # interleave y/z exactly like the single-device inject
    cy = _interleave(c3, ny, 1) if sy == 2 else c3
    cyz = _interleave(cy, nz, 2) if sz == 2 else cy      # (mxl, ny, nz)
    ly = _interleave(left, ny, 1) if sy == 2 else left
    lyz = _interleave(ly, nz, 2) if sz == 2 else ly      # (1, ny, nz)
    # x-axis: ext index = lx + 1, coarse values at ext 2j+2 (local) and
    # ext 0 (left halo); ext length nxl + 2
    z = jnp.zeros_like(cyz)
    inter = jnp.stack([z, cyz], axis=1).reshape(2 * mxl, ny, nz)
    inj = jnp.concatenate([lyz, inter, jnp.zeros_like(lyz)], axis=0)
    # f[lx] = Σ_d w_d[lx] · inj[lx + 1 + dx, y + dy, z + dz]
    from ..amg.boxmg import DIRS

    w_loc = lev.p_w_halo[:, 0, :nxl]                     # (27, nxl, ny, nz)
    injp = jnp.pad(inj, ((0, 0), (1, 1), (1, 1)))
    out = jnp.zeros((nxl, ny, nz), dtype=c_loc.dtype)
    for k, (dx, dy, dz) in enumerate(DIRS):
        out = out + w_loc[k] * injp[1 + dx: 1 + dx + nxl,
                                    1 + dy: 1 + dy + ny,
                                    1 + dz: 1 + dz + nz]
    return out.reshape(-1)


def _local_cycle(dh: DistStructuredHierarchy, params, l, b_loc, axis):
    if l == len(dh.sharded):
        # replicated tail: one all-gather, plain V-cycle, slice back
        b_full = maybe_all_gather(b_loc, axis, dh.ndev)
        x_full = vcycle(dh.tail, b_full)
        k = jax.lax.axis_index(axis)
        n_loc = b_loc.shape[0]
        return jax.lax.dynamic_slice(x_full, (k * n_loc,), (n_loc,))

    lev = dh.sharded[l]
    x = jnp.zeros_like(b_loc)
    r = b_loc
    for i in range(params.n_pre_smooth):
        x, r = smooth_rx(lev, x, b_loc, params, r=r, want_residual=True,
                         x_is_zero=(i == 0))
    bc = _restrict_local(r, lev, axis)
    xc = _local_cycle(dh, params, l + 1, bc, axis)
    x = x + _prolongate_local(xc, lev, axis)
    for _ in range(params.n_post_smooth):
        x, _ = smooth_rx(lev, x, b_loc, params)
    return x


def _local_solve(dh, b_loc, x0_loc, tol, rtol, *, params, maxiter, axis):
    pdot = lambda u, v: jax.lax.psum(jnp.vdot(u, v), axis)
    matvec = lambda v: op_matvec(dh.sharded[0].a, v)
    precond = lambda r: _local_cycle(dh, params, 0, r, axis)
    return pcg(matvec, precond, b_loc, x0_loc, tol=tol, rtol=rtol,
               maxiter=maxiter, dot=pdot)


def dist_structured_solve(h: StructuredSetupResult, b, *, mesh: Mesh | None
                          = None, x0=None, tol=0.0, rtol=1e-8,
                          maxiter: int = 200, axis: str = AXIS):
    """Distributed structured AMG-PCG over a device mesh.

    `h` is a host setup_structured result (operator-interp path). Returns
    the PCGResult with a row-sharded solution. The whole solve — halo
    SpMV, smoothers, weighted transfers, Krylov reductions — is ONE
    jitted shard_map."""
    from .sharded import make_mesh

    if mesh is None:
        mesh = make_mesh(axis=axis)
    assert h.params.cycle_type == "V", \
        "distributed structured path supports V-cycles"
    dh = shard_structured_hierarchy(h, mesh, axis)
    dtype = dh.sharded[0].a.data.dtype
    b_dev = jax.device_put(jnp.asarray(np.asarray(b), dtype=dtype),
                           NamedSharding(mesh, P(axis)))
    x0_dev = (jnp.zeros_like(b_dev) if x0 is None else
              jax.device_put(jnp.asarray(np.asarray(x0), dtype=dtype),
                             NamedSharding(mesh, P(axis))))

    specs = _hierarchy_specs(dh)
    fn = jax.jit(jax.shard_map(
        functools.partial(_local_solve, params=h.params, maxiter=maxiter,
                          axis=axis),
        mesh=mesh,
        in_specs=(specs, P(axis), P(axis), P(), P()),
        out_specs=PCGResult(x=P(axis), niters=P(), history=P(),
                            converged=P()),
        check_vma=False,
    ))
    return fn(dh, b_dev, x0_dev, jnp.asarray(tol, dtype=dtype),
              jnp.asarray(rtol, dtype=dtype))
