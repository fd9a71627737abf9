"""1-D building blocks for tensor-product Q_p elements on structured grids.

Everything 3-D is assembled from 1-D Lagrange bases and Gauss quadrature by
tensor products (Kronecker structure) — the natural factorization for both
numpy vectorization and MXU-friendly einsum contractions.
"""

from __future__ import annotations

import numpy as np


def gauss_1d(n: int):
    """n-point Gauss-Legendre rule on [0, 1]: (points, weights)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def lagrange_nodes(p: int):
    """Equispaced Lagrange support points on [0, 1] (degree p)."""
    return np.linspace(0.0, 1.0, p + 1)


def lagrange_eval(p: int, pts):
    """Values and derivatives of the p+1 Lagrange basis functions at pts.

    Returns (V, D) with V[a, q] = l_a(pts[q]), D[a, q] = l'_a(pts[q]).
    """
    nodes = lagrange_nodes(p)
    pts = np.asarray(pts)
    n = p + 1
    V = np.ones((n, pts.size))
    D = np.zeros((n, pts.size))
    for a in range(n):
        for b in range(n):
            if b == a:
                continue
            V[a] *= (pts - nodes[b]) / (nodes[a] - nodes[b])
        # derivative by product rule
        for b in range(n):
            if b == a:
                continue
            term = np.ones(pts.size) / (nodes[a] - nodes[b])
            for c in range(n):
                if c in (a, b):
                    continue
                term *= (pts - nodes[c]) / (nodes[a] - nodes[c])
            D[a] += term
    return V, D


def mass_stiffness_1d(p: int, nq: int | None = None):
    """Exact (for polynomial degree) 1-D mass and stiffness matrices on
    the unit interval: M_ab = ∫ l_a l_b, S_ab = ∫ l'_a l'_b."""
    if nq is None:
        nq = p + 1
    xq, wq = gauss_1d(nq)
    V, D = lagrange_eval(p, xq)
    M = (V * wq) @ V.T
    S = (D * wq) @ D.T
    return M, S
