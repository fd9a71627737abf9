"""Row-partitioned sparse solve over a jax.sharding.Mesh.

Design (SURVEY.md §7.8 / BASELINE north star): 1-D row partition of the
ELL arrays of every hierarchy level; vectors live row-sharded on the fine
axis; XLA/GSPMD materializes the communication (all-gather of the source
vector for off-shard column gathers, psum for dot products) from sharding
annotations alone — the V-cycle/PCG code is byte-identical to the
single-device path. This is the idiomatic-JAX replacement for the
reference's (disabled) PETSc MPI layer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..amg.hierarchy import DeviceHierarchy, DeviceLevel
from ..sparse.ell import ELL


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


def _pad_rows(arr, mult):
    n = arr.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths)


def sharded_ell(a: ELL, mesh: Mesh, axis: str = "rows") -> ELL:
    """Shard the row dimension of data/cols across the mesh (row-padded to
    a multiple of the axis size; padded rows are all-zero ⇒ harmless)."""
    nd = mesh.shape[axis]
    data = _pad_rows(a.data, nd)
    cols = _pad_rows(a.cols, nd)
    sh = NamedSharding(mesh, P(axis, None))
    return ELL(
        data=jax.device_put(data, sh),
        cols=jax.device_put(cols, sh),
        nrows=a.nrows, ncols=a.ncols, nnz=a.nnz,
    )


def shard_vector(x, mesh: Mesh, axis: str = "rows"):
    """Row-shard a vector (padded to the axis size)."""
    x = jnp.asarray(x)
    nd = mesh.shape[axis]
    x = _pad_rows(x, nd)
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def shard_hierarchy(h: DeviceHierarchy, mesh: Mesh,
                    axis: str = "rows") -> DeviceHierarchy:
    """Shard every level's operators row-wise; smoother diagonals ride the
    same row partition; the (tiny) coarsest dense inverse is replicated."""
    from ..sparse.ell import DenseOp
    from ..sparse.well import WELL

    if any(isinstance(lev.a, WELL) for lev in h.levels):
        raise TypeError(
            "shard_hierarchy partitions ELL row arrays; rebuild the "
            "hierarchy with AMGParams(device_format='ell') for the GSPMD "
            "row-sharded path (WELL is the single-chip unstructured "
            "format)")
    levels = []
    for lev in h.levels:
        if isinstance(lev.a, DenseOp):
            # dense coarse levels are tiny — replicate them, padded to the
            # mesh-divisible vector lengths the sharded chain produces
            nd = mesh.shape[axis]
            lp = lambda n: n + (-n) % nd
            s0 = lev.a.m.shape[0]

            def pad2(m, rp, cp):
                return jnp.pad(m, ((0, rp - m.shape[0]),
                                   (0, cp - m.shape[1])))

            p_op = r_op = None
            if lev.p is not None:
                s1 = lev.p.m.shape[1]
                p_op = DenseOp(m=pad2(lev.p.m, lp(s0), lp(s1)),
                               nrows=lev.p.nrows, ncols=lev.p.ncols)
                r_op = DenseOp(m=pad2(lev.r.m, lp(s1), lp(s0)),
                               nrows=lev.r.nrows, ncols=lev.r.ncols)
            padded = DeviceLevel(
                a=DenseOp(m=pad2(lev.a.m, lp(s0), lp(s0)),
                          nrows=lev.a.nrows, ncols=lev.a.ncols),
                p=p_op, r=r_op,
                inv_diag=jnp.pad(lev.inv_diag, (0, lp(s0) - s0)),
                inv_l1=jnp.pad(lev.inv_l1, (0, lp(s0) - s0)),
                lam_max=lev.lam_max,
            )
            levels.append(jax.device_put(padded, NamedSharding(mesh, P())))
            continue
        levels.append(DeviceLevel(
            a=sharded_ell(lev.a, mesh, axis),
            p=sharded_ell(lev.p, mesh, axis) if lev.p is not None else None,
            r=sharded_ell(lev.r, mesh, axis) if lev.r is not None else None,
            inv_diag=shard_vector(lev.inv_diag, mesh, axis),
            inv_l1=shard_vector(lev.inv_l1, mesh, axis),
            lam_max=replicate(lev.lam_max, mesh),
        ))
    # coarsest dense inverse: zero-pad to the padded coarse size so
    # `coarse_inv @ b` keeps the padded-vector shape contract (padded
    # entries stay exactly zero).
    nd = mesh.shape[axis]
    nc = h.coarse_inv.shape[0]
    nc_pad = nc + (-nc) % nd
    cinv = jnp.zeros((nc_pad, nc_pad), dtype=h.coarse_inv.dtype)
    cinv = cinv.at[:nc, :nc].set(h.coarse_inv)
    return DeviceHierarchy(levels=tuple(levels),
                           coarse_inv=replicate(cinv, mesh),
                           params=h.params)


def shard_solve(hierarchy, b, x0=None, *, mesh: Mesh | None = None,
                tol=0.0, rtol=1e-8, maxiter=200):
    """Distributed AMG-PCG: same jitted solve, sharded operands.

    `hierarchy` is a host Hierarchy (amg.setup output); returns the
    PCGResult with a row-sharded solution.
    """
    from ..solvers.amg_solver import _jit_solve

    if mesh is None:
        mesh = make_mesh()
    dh = shard_hierarchy(hierarchy.device, mesh)
    dtype = dh.levels[0].a.data.dtype
    b_dev = shard_vector(jnp.asarray(np.asarray(b), dtype=dtype), mesh)
    x0_dev = (jnp.zeros_like(b_dev) if x0 is None
              else shard_vector(jnp.asarray(np.asarray(x0), dtype=dtype),
                                mesh))
    return _jit_solve(dh, dh.levels[0].a, b_dev, x0_dev,
                      jnp.asarray(tol, dtype=dtype),
                      jnp.asarray(rtol, dtype=dtype), maxiter)
