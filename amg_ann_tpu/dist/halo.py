"""Explicit halo-exchange distributed SpMV (shard_map + ppermute).

The GSPMD path (sharded.py) lets XLA all-gather the source vector; for
banded (DIA) operators that is wasteful — each device only needs `halo`
entries from each neighbor, where halo = max |offset|. This module does the
minimal exchange explicitly:

    from_left  = ppermute(x_local[-halo:], shift +1)   # neighbor's tail
    from_right = ppermute(x_local[:halo],  shift -1)   # neighbor's head
    y_local  = Σ_k d_k ⊙ zeropad(x_local)[halo+o_k : halo+o_k+nb]  # interior
    y[:halo]  += Σ_k d_k[:halo]  ⊙ window(from_left)               # boundary
    y[-halo:] += Σ_k d_k[-halo:] ⊙ window(from_right)

Ring wrap-around at the ends delivers garbage values that are annihilated
by the zero coefficients DIA carries where an offset walks off the matrix —
the same argument that makes circular rolls exact (sparse/dia.py).

The interior product reads ONLY x_local (halo reads are zero-padded), so
it has no data dependency on either ppermute; on TPU the latency-hiding
scheduler runs the collective-permutes concurrently with the O(K·nb)
interior compute, and only the O(K·halo) boundary corrections wait on
them. (The previous formulation concatenated the permute results into
x_ext before ANY multiply, serializing exchange → compute.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse.dia import DIA


def dia_halo(offsets) -> int:
    return max((abs(int(o)) for o in offsets), default=1)


# Measurement switch (trace-time static): True replaces every halo
# ppermute / tail all-gather with a local stand-in of identical shape and
# FLOP cost, isolating communication time by A/B at fixed iteration count
# (dist/multihost.comm_breakdown). Results are numerically wrong in this
# mode — it exists only for timing.
COMM_OFF = False

# When a list, every maybe_* call appends (kind, local_shape, dtype) at
# TRACE time — tracing the solve once (fresh caches) harvests the
# collective schedule (loop-body collectives appear once per textual
# call site). dist/multihost.comm_breakdown uses it to time the same
# collectives in isolation (no compute to overlap with).
COMM_LOG = None


def _log(kind, x):
    if COMM_LOG is not None:
        COMM_LOG.append((kind, tuple(int(s) for s in x.shape),
                         str(x.dtype)))


def maybe_ppermute(x, axis, pairs):
    _log("ppermute", x)
    if COMM_OFF:
        return jnp.zeros_like(x)
    return jax.lax.ppermute(x, axis, pairs)


def maybe_all_gather(x, axis, ndev: int):
    _log("all_gather", x)
    if COMM_OFF:
        return jnp.tile(x, ndev)
    return jax.lax.all_gather(x, axis, tiled=True)


def _local_spmv(data_loc, x_loc, from_left, from_right, offsets,
                halo: int, nb: int):
    """y = A_loc @ [from_left | x_loc | from_right], overlap-friendly.

    The interior sum reads only a zero-padded x_loc — no dependency on the
    ppermute outputs — so XLA can overlap the exchange with it. Boundary
    rows then get the halo contributions: row i < halo reads from_left at
    ext index halo+i+o (only when i+o < 0, i.e. index < halo; the padded
    window is zero elsewhere), and row nb-halo+i' reads from_right at
    i'+o-halo (only when ≥ 0; ditto)."""
    zeros = jnp.zeros((halo,), dtype=x_loc.dtype)
    xp = jnp.concatenate([zeros, x_loc, zeros])
    y = jnp.zeros(nb, dtype=data_loc.dtype)
    for k, o in enumerate(offsets):
        y = y + data_loc[k] * jax.lax.dynamic_slice(
            xp, (halo + int(o),), (nb,))
    # boundary corrections: windows padded so out-of-halo reads are zero
    zeros2 = jnp.zeros((2 * halo,), dtype=x_loc.dtype)
    u = jnp.concatenate([from_left, zeros2])    # index halo+i+o, hot < halo
    v = jnp.concatenate([zeros2, from_right])   # index halo+i'+o, hot ≥ 2h
    cl = jnp.zeros(halo, dtype=data_loc.dtype)
    cr = jnp.zeros(halo, dtype=data_loc.dtype)
    for k, o in enumerate(offsets):
        cl = cl + data_loc[k, :halo] * jax.lax.dynamic_slice(
            u, (halo + int(o),), (halo,))
        cr = cr + data_loc[k, nb - halo:] * jax.lax.dynamic_slice(
            v, (halo + int(o),), (halo,))
    y = y.at[:halo].add(cl)
    return y.at[nb - halo:].add(cr)


import dataclasses as _dc


@jax.tree_util.register_dataclass
@_dc.dataclass
class HaloDIA:
    """The per-device shard of a DIA operator INSIDE a shard_map region.

    data: (K, n_loc) local flat coefficient rows; offsets are the global
    flat offsets. A matvec exchanges `halo` entries with each ring
    neighbor (two ppermutes, overlapping local compute under XLA's async
    collectives) and runs the shifted multiply-add locally — this is
    dist/halo.py's kernel as a first-class operator usable by the
    smoother/cycle machinery (solvers/ops.op_matvec dispatches on it), so
    the halo exchange lives INSIDE the V-cycle.
    """

    data: jax.Array
    offsets: tuple = _dc.field(metadata=dict(static=True))
    axis: str = _dc.field(metadata=dict(static=True))
    halo: int = _dc.field(metadata=dict(static=True))
    ndev: int = _dc.field(metadata=dict(static=True))

    def matvec(self, x_loc):
        fwd = [(i, (i + 1) % self.ndev) for i in range(self.ndev)]
        bwd = [(i, (i - 1) % self.ndev) for i in range(self.ndev)]
        from_left = maybe_ppermute(x_loc[-self.halo:], self.axis, fwd)
        from_right = maybe_ppermute(x_loc[:self.halo], self.axis, bwd)
        return _local_spmv(self.data, x_loc, from_left, from_right,
                           self.offsets, self.halo, x_loc.shape[0])


def halo_spmv_shardmap(a: DIA, mesh: Mesh, axis: str = "rows"):
    """Build (spmv_fn, shard) for matrix `a` distributed over `mesh`.

    spmv_fn(data_sharded, x_sharded) -> y_sharded; data must be reshaped
    flat (K, R·C) and padded so R·C divides the mesh size.
    """
    ndev = mesh.shape[axis]
    n_flat = a.data.shape[1] * a.cols
    assert n_flat % ndev == 0, (n_flat, ndev)
    nb = n_flat // ndev
    halo = dia_halo(a.offsets)
    assert halo <= nb, f"halo {halo} exceeds block {nb}; use fewer devices"
    offsets = a.offsets

    fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
    bwd = [(i, (i - 1) % ndev) for i in range(ndev)]

    def kernel(data_loc, x_loc):
        # data_loc: (K, nb); x_loc: (nb,)
        from_left = jax.lax.ppermute(x_loc[-halo:], axis, fwd)
        from_right = jax.lax.ppermute(x_loc[:halo], axis, bwd)
        return _local_spmv(data_loc, x_loc, from_left, from_right,
                           offsets, halo, nb)

    fn = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(fn)


def distribute_dia(a: DIA, mesh: Mesh, axis: str = "rows"):
    """Shard (K, R·C) data and return (spmv_fn, data_sharded, put_vector)."""
    n_flat = a.data.shape[1] * a.cols
    data = a.data.reshape(a.data.shape[0], n_flat)
    sh_mat = NamedSharding(mesh, P(None, axis))
    sh_vec = NamedSharding(mesh, P(axis))
    data_sharded = jax.device_put(data, sh_mat)
    fn = halo_spmv_shardmap(a, mesh, axis)

    def put_vector(x):
        x = jnp.asarray(x)
        if x.shape[0] != n_flat:
            x = jnp.pad(x, (0, n_flat - x.shape[0]))
        return jax.device_put(x, sh_vec)

    return fn, data_sharded, put_vector
