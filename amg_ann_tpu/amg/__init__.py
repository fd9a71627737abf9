"""Algebraic multigrid setup (native replacement for hypre BoomerAMG).

Two hierarchy builders:
  * `setup` — classical: strength-of-connection(θ) → PMIS → direct
    interpolation → Galerkin RAP; works on any SPD matrix.
  * `structured_mg.setup_structured` — geometric coarsening with Galerkin
    operator algebra (PFMG-style); every level stays banded — the
    gather-free TPU fast path for structured-grid problems.
"""

from .coarsen import aggressive_pass, pmis
from .hierarchy import (
    AMGParams, DeviceHierarchy, DeviceLevel, Hierarchy, HierarchyStats, setup,
)
from .interp import direct_interpolation, truncate
from .strength import classical_strength
from .structured_mg import (
    StructuredHierarchy, StructuredLevel, setup_structured,
)
from .transfer import prolongate, prolongation_csr, restrict

__all__ = [
    "AMGParams", "DeviceHierarchy", "DeviceLevel", "Hierarchy",
    "HierarchyStats", "setup", "classical_strength", "pmis",
    "aggressive_pass", "direct_interpolation", "truncate",
    "setup_structured", "StructuredHierarchy", "StructuredLevel",
    "prolongation_csr", "prolongate", "restrict",
]
