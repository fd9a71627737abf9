"""Smoothers: damped Jacobi, ℓ1-Jacobi, Chebyshev (all SpMV-based, linear).

TPU-native choice: hypre's default hybrid Gauss–Seidel is sequential per
row; these polynomial/diagonal smoothers are pure SpMV + AXPY chains that
XLA fuses, and (crucially) are *fixed linear operators*, keeping the
V-cycle a legal SPD preconditioner for CG.
"""

from __future__ import annotations

from .ops import op_matvec


def jacobi(lev, x, b, omega=None):
    """x ← x + ω D⁻¹ (b − A x); default ω = 1/λ_max(D⁻¹A) (damped)."""
    if omega is None:
        omega = 1.0 / lev.lam_max
    return x + omega * lev.inv_diag * (b - op_matvec(lev.a, x))


def l1_jacobi(lev, x, b):
    """x ← x + D_ℓ1⁻¹ (b − A x), D_ℓ1 = Σ_j |a_ij|. Unconditionally
    convergent for SPD A; the BoomerAMG relax-18 analog."""
    return x + lev.inv_l1 * (b - op_matvec(lev.a, x))


def chebyshev(lev, x, b, degree: int = 2, eig_fraction: float = 0.3):
    """Chebyshev polynomial smoother on D⁻¹A over [f·λ_max, λ_max].

    Standard three-term recurrence (Ifpack2/hypre style); eig_fraction is
    hypre's ChebyshevEigRatio default 0.3.
    """
    lmax = lev.lam_max
    lmin = eig_fraction * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    r = b - op_matvec(lev.a, x)
    z = lev.inv_diag * r
    d = z / theta
    rho = 1.0 / sigma1
    for _ in range(degree - 1):
        x = x + d
        r = r - op_matvec(lev.a, d)
        z = lev.inv_diag * r
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * z
        rho = rho_new
    return x + d


def apply_smoother(lev, x, b, params):
    """Dispatch on AMGParams.smoother (static string)."""
    if params.smoother == "jacobi":
        return jacobi(lev, x, b)
    if params.smoother == "l1jacobi":
        return l1_jacobi(lev, x, b)
    if params.smoother == "chebyshev":
        return chebyshev(lev, x, b, degree=params.cheb_degree)
    raise ValueError(f"unknown smoother {params.smoother!r}")
