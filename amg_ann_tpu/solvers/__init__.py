"""Solve phase: smoothers, V-cycle, PCG, and the amg_solve entry point."""

from .amg_solver import SolveResult, amg_solve, amg_solve_batched
from .ann_solver import ann_amg_solve, predict_theta_for_matrix
from .cycle import vcycle
from .eigen import EigenResult, dense_extremal, lanczos_extremal
from .krylov import BatchedPCGResult, PCGResult, cg, pcg, pcg_batched
from .refine import IRResult, ir_solve
from .smoothers import chebyshev, jacobi, l1_jacobi

__all__ = [
    "amg_solve", "amg_solve_batched", "SolveResult", "vcycle", "pcg",
    "pcg_batched", "BatchedPCGResult", "cg", "PCGResult",
    "jacobi", "l1_jacobi", "chebyshev", "ir_solve", "IRResult",
    "lanczos_extremal", "dense_extremal", "EigenResult",
    "ann_amg_solve", "predict_theta_for_matrix",
]
