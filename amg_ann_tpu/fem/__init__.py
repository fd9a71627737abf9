"""Problem generators: structured/unstructured FEM + FD stencils."""

from .stencil import diffusion_7pt, jumping_coefficient_field, poisson_7pt

__all__ = ["poisson_7pt", "diffusion_7pt", "jumping_coefficient_field"]
