"""Structured (PFMG-style) Galerkin multigrid — the all-DIA TPU fast path.

For operators assembled on structured interior grids (the reference's
entire benchmark surface: testcase2/2.1 structured cubes, the 7-point FD
problems), classical PMIS coarsening destroys bandedness and forces the
solve onto gather-SpMV, which XLA executes ~600× below HBM speed-of-light
on TPU. This mode instead coarsens GEOMETRICALLY (every second node per
axis, trilinear P / full-weighting R) while keeping the operator algebra
GALERKIN (A_{l+1} = Pᵀ A_l P computed on host from the explicit CSR P) —
hypre ships PFMG for exactly this reason. Every level's operator stays a
≤27-offset banded matrix ⇒ the whole V-cycle runs on shifted vector
multiply-adds (DIA / Pallas) with zero gathers.

Callers choose the path explicitly: `amg_solve(..., grid_shape=...)` /
`ir_solve(..., grid_shape=...)` build this hierarchy; without grid_shape
the classical PMIS path (amg/hierarchy.py) is used.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..sparse.csr import CSR
from ..sparse.dia import DIA, from_csr_dia
from ..sparse.spgemm import spgemm
from .hierarchy import AMGParams, HierarchyStats, _estimate_lam_max, _make_stats
from .transfer import coarse_size, prolongation_csr


@struct.dataclass
class StructuredLevel:
    a: DIA
    inv_diag: jax.Array
    inv_l1: jax.Array
    lam_max: jax.Array
    shape: tuple = struct.field(pytree_node=False)  # (nx, ny, nz)


@struct.dataclass
class StructuredHierarchy:
    levels: tuple
    coarse_inv: jax.Array
    params: AMGParams = struct.field(pytree_node=False)


@dataclasses.dataclass
class StructuredSetupResult:
    a_mats: list
    p_mats: list
    device: StructuredHierarchy
    stats: HierarchyStats
    params: AMGParams


def setup_structured(a: CSR, grid_shape, params: AMGParams | None = None,
                     **kw) -> StructuredSetupResult:
    """Build the all-banded hierarchy for a matrix on `grid_shape`."""
    if params is None:
        params = AMGParams(**kw)
    t0 = time.perf_counter()
    dtype = params.dtype or a.data.dtype
    assert int(np.prod(grid_shape)) == a.nrows, (grid_shape, a.nrows)

    a_mats = [a.astype(dtype)]
    p_mats = []
    shapes = [tuple(grid_shape)]
    while (a_mats[-1].nrows > params.max_coarse_size
           and len(a_mats) < params.max_levels
           and min(shapes[-1]) >= 2):
        p = prolongation_csr(shapes[-1])
        r = p.transpose()
        a_c = spgemm(r, spgemm(a_mats[-1], p))
        p_mats.append(p)
        a_mats.append(a_c)
        shapes.append(tuple(coarse_size(s) for s in shapes[-1]))

    stats = _make_stats(a_mats, p_mats)
    levels = []
    for a_l, shape in zip(a_mats, shapes):
        dia = from_csr_dia(a_l, dtype=dtype)
        assert dia is not None, "structured level lost bandedness"
        diag = a_l.diagonal()
        inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
        rows, _, vals = a_l.row_expand()
        l1 = np.bincount(rows, weights=np.abs(vals), minlength=a_l.nrows)
        inv_l1 = np.where(l1 != 0, 1.0 / np.where(l1 == 0, 1, l1), 0.0)
        lam = _estimate_lam_max(a_l, inv_diag)
        levels.append(StructuredLevel(
            a=dia,
            inv_diag=jnp.asarray(inv_diag, dtype=dtype),
            inv_l1=jnp.asarray(inv_l1, dtype=dtype),
            lam_max=jnp.asarray(lam, dtype=dtype),
            shape=shape,
        ))
    coarse = a_mats[-1].to_dense().astype(np.float64)
    try:
        coarse_inv = np.linalg.inv(coarse)
    except np.linalg.LinAlgError:
        coarse_inv = np.linalg.pinv(coarse)
    device = StructuredHierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
        params=params,
    )
    stats.t_setup = time.perf_counter() - t0
    return StructuredSetupResult(a_mats, p_mats, device, stats, params)
