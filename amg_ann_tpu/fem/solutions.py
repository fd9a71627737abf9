"""Manufactured solutions — behavioral port of common/cube_solution.h.

Each 1-D factor family provides (f, f′, f″); 3-D solutions are tensor
products u(x) = Π_d f(x_d·freq), with gradient/Laplacian assembled from the
factor table exactly as the reference does (testcase2 main.cpp:127-170):

    u(p)      = Π_i f0(p_i)
    ∂_i u(p)  = f1(p_i) · Π_{j≠i} f0(p_j)
    Δu(p)     = Σ_i f2(p_i) · Π_{j≠i} f0(p_j)
    rhs       = −Δu  (tc2's RightHandSide; μ multiplies inside the
                assembly integrand, main.cpp:296-299)

sol_id table (cube_solution.h:34-38): 0 = sin, 1 = sin², 3 = cos;
get_sol_id(pattern_size) = 3·(1 − ps % 2) — sin for odd patterns, cos for
even (main.cpp:71-73).
"""

from __future__ import annotations

import numpy as np


def _sol0():
    return (
        lambda t, f: np.sin(f * t),
        lambda t, f: f * np.cos(f * t),
        lambda t, f: -f * f * np.sin(f * t),
    )


def _sol1():
    return (
        lambda t, f: np.sin(f * t) ** 2,
        lambda t, f: 2.0 * f * np.cos(f * t) * np.sin(f * t),
        lambda t, f: 2.0 * f * f * np.cos(2.0 * f * t),
    )


def _sol3():
    return (
        lambda t, f: np.cos(f * t),
        lambda t, f: -f * np.sin(f * t),
        lambda t, f: -f * f * np.cos(f * t),
    )


SOLUTIONS = {0: _sol0(), 1: _sol1(), 3: _sol3()}


def get_sol_id(pattern_size: int) -> int:
    return 3 * (1 - (pattern_size % 2))


class TensorSolution:
    """u(x) = Π_d SOLUTIONS[sol_id][0](x_d, freq) on R^dim."""

    def __init__(self, sol_id: int, freq: float, dim: int = 3):
        self.sol_id = sol_id
        self.freq = freq
        self.dim = dim
        self.f = SOLUTIONS[sol_id]

    def value(self, pts):
        pts = np.asarray(pts)
        out = np.ones(pts.shape[:-1])
        for d in range(self.dim):
            out = out * self.f[0](pts[..., d], self.freq)
        return out

    def gradient(self, pts):
        pts = np.asarray(pts)
        grad = np.empty(pts.shape)
        for i in range(self.dim):
            g = np.ones(pts.shape[:-1])
            for j in range(self.dim):
                g = g * self.f[1 if i == j else 0](pts[..., j], self.freq)
            grad[..., i] = g
        return grad

    def laplacian(self, pts):
        pts = np.asarray(pts)
        out = np.zeros(pts.shape[:-1])
        for i in range(self.dim):
            term = np.ones(pts.shape[:-1])
            for j in range(self.dim):
                term = term * self.f[2 if i == j else 0](pts[..., j], self.freq)
            out = out + term
        return out

    def rhs(self, pts):
        """−Δu (the diffusion coefficient multiplies inside the integral)."""
        return -self.laplacian(pts)
