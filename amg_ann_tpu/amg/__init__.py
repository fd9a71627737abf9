"""Algebraic multigrid setup (native replacement for hypre BoomerAMG)."""

from .coarsen import aggressive_pass, pmis
from .hierarchy import (
    AMGParams, DeviceHierarchy, DeviceLevel, Hierarchy, HierarchyStats, setup,
)
from .interp import direct_interpolation, truncate
from .strength import classical_strength

__all__ = [
    "AMGParams", "DeviceHierarchy", "DeviceLevel", "Hierarchy",
    "HierarchyStats", "setup", "classical_strength", "pmis",
    "aggressive_pass", "direct_interpolation", "truncate",
]
