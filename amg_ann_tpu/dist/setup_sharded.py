"""Sharded (per-device-memory) structured hierarchy SETUP.

SURVEY §7.8 / round-2 verdict item 7: the device setup was single-device,
capping distributed problem size at one chip's HBM even though the SOLVE
already runs sharded (dist/structured.py). The whole setup pipeline —
strength masks, BoxMG collapse weights, stencil-algebra RAP, DIA packing
(amg/boxmg_device.py) — is ±1-slab-local along x, so GSPMD parallelizes
it from a single sharding annotation: upload the fine stencil x-slab
sharded and every fine-level intermediate inherits the x-sharded layout;
XLA inserts the halo collective-permutes at slab edges. Per-device setup
peak is O(n/ndev) for every fine-level array (the coarse tail and the
dense inverse are tiny and may replicate).

Verified on the 8-device virtual CPU mesh (tests/test_dist.py +
__graft_entry__.dryrun_multichip part 4): sharded-setup hierarchies are
bit-compatible with the single-device setup and their fine levels carry
non-replicated shardings.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..amg.hierarchy import AMGParams


def setup_structured_sharded(stencil, grid_shape, params: AMGParams,
                             mesh, a_slots=None):
    """Device setup with the fine stencil sharded over the mesh's first
    axis as x-slabs. `stencil`: (27, nx, ny, nz) host array (or anything
    np.asarray-able); nx must be divisible by the axis size."""
    ax = mesh.axis_names[0]
    ndev = mesh.shape[ax]
    nx = grid_shape[0]
    assert nx % ndev == 0, (
        f"nx={nx} not divisible by mesh axis {ax!r} size {ndev}")
    dtype = params.dtype or np.float32
    s_host = np.asarray(stencil, dtype=dtype)
    if a_slots is None:
        a_slots = tuple(k for k in range(27) if np.any(s_host[k]))
    s_dev = jax.device_put(
        jnp.asarray(s_host),
        NamedSharding(mesh, P(None, ax, None, None)))

    from ..amg.structured_mg import _setup_operator_device

    return _setup_operator_device(s_dev, grid_shape, params, dtype,
                                  tuple(a_slots))
