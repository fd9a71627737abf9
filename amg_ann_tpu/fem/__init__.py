"""Problem generators: FD stencils, structured/unstructured FEM,
single-cell diffusion, vector elasticity — the reference's four testcase
families re-built TPU-first."""

from .elasticity import LinearElasticity, make_epsv
from .singlecell import SingleCellDiffusion
from .solutions import SOLUTIONS, TensorSolution, get_sol_id
from .stencil import (
    anisotropic_27pt, diffusion_7pt, jumping_coefficient_field, poisson_7pt,
)
from .structured import StructuredDiffusion, compute_order
from .unstructured import (
    MESH_GENERATORS, TetMesh, UnstructuredDiffusion, refine,
)

__all__ = [
    "poisson_7pt", "diffusion_7pt", "jumping_coefficient_field",
    "anisotropic_27pt",
    "StructuredDiffusion", "SingleCellDiffusion", "LinearElasticity",
    "UnstructuredDiffusion", "TetMesh", "MESH_GENERATORS", "refine",
    "TensorSolution", "SOLUTIONS", "get_sol_id", "make_epsv",
    "compute_order",
]
