"""Multi-device execution: row-partitioned solver + data-parallel training.

The reference's MPI surface is vestigial (hard-exits beyond 1 rank,
SURVEY.md §2.3); this package is the real TPU-native scaling layer:

  * solver: 1-D row partition of every level's ELL arrays over a device
    mesh via jax.sharding (GSPMD inserts the all-gathers of x for the
    off-shard gather columns); Pallas halo-overlap is the planned upgrade.
  * ANN training: batch-sharded (data-parallel) train step, params
    replicated.
"""

from .sharded import (
    make_mesh, replicate, shard_hierarchy, shard_solve, shard_vector,
    sharded_ell,
)

__all__ = ["make_mesh", "sharded_ell", "shard_hierarchy", "shard_vector",
           "replicate", "shard_solve"]
