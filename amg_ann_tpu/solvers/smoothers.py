"""Smoothers: damped Jacobi, ℓ1-Jacobi, Chebyshev (all SpMV-based, linear).

TPU-native choice: hypre's default hybrid Gauss–Seidel is sequential per
row; these polynomial/diagonal smoothers are pure SpMV + AXPY chains that
XLA fuses, and (crucially) are *fixed linear operators*, keeping the
V-cycle a legal SPD preconditioner for CG.

All three share one residual-carrying recurrence over (x, r, d):

    t  = A d
    x' = x + d,   r' = r − t          (r tracks b − A x exactly)
    d' = c_a d + c_b · s ⊙ r'         (s = D⁻¹ or D_ℓ1⁻¹)

which lets the V-cycle (a) skip the A·0 product on entry (x starts at 0 ⇒
r = b), (b) reuse the smoother's final residual for the restriction
instead of recomputing b − A x, and (c) — on TPU — execute the whole step
as ONE fused Pallas kernel (sparse/pallas_spmv.dia_smooth_step) instead of
a matvec plus a chain of elementwise ops.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from .ops import op_cheb_sweep, op_matvec, op_smooth_apply, op_smooth_step

# AMG_FUSED_APPLY=0 reverts smooth_rx to the separate matvec + sweep
# dispatch (no-code-edit lever if the whole-application kernel fails
# Mosaic compile on new hardware; bench.py auto-falls-back through it).
FUSED_APPLY = os.environ.get("AMG_FUSED_APPLY", "1") != "0"


def _coeffs(lev, params):
    """(s, c_a(rho), c_b(rho), rho0, theta_c) for the unified recurrence."""
    if params.smoother == "jacobi":
        omega = 1.0 / lev.lam_max
        return lev.inv_diag, omega
    if params.smoother == "l1jacobi":
        return lev.inv_l1, 1.0
    raise ValueError(f"unknown smoother {params.smoother!r}")


def smoother_coef_rows(lev, params):
    """(n_rows, 2) recurrence coefficients for ONE smoother application
    in the op_smooth_apply format: row 0 = (init_scale, 0) seeds
    d = init_scale·(s ⊙ r); rows 1.. = (c_a, c_b) recurrence steps.
    Built from traced scalars (λ_max lives on device) so the jit cache is
    θ-independent. The fused-tail kernel (sparse/pallas_cycle.py) uses
    the same rows."""
    dt = lev.inv_diag.dtype
    if params.smoother == "chebyshev":
        lmax = lev.lam_max
        lmin = 0.3 * lmax
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma1 = theta / delta
        rows = [jnp.stack([1.0 / theta, jnp.zeros((), dt)])]
        rho = 1.0 / sigma1
        for _ in range(params.cheb_degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            rows.append(jnp.stack([
                jnp.asarray(rho_new * rho, dtype=dt),
                jnp.asarray(2.0 * rho_new / delta, dtype=dt)]))
            rho = rho_new
        return jnp.stack(rows)
    if params.smoother == "jacobi":
        return jnp.stack([1.0 / lev.lam_max,
                          jnp.zeros((), dt)]).reshape(1, 2)
    if params.smoother == "l1jacobi":
        return jnp.asarray([[1.0, 0.0]], dtype=dt)
    raise ValueError(params.smoother)


def smoother_scale_vec(lev, params):
    """The s vector of the recurrence: D⁻¹ (Jacobi/Chebyshev) or D_ℓ1⁻¹."""
    return lev.inv_l1 if params.smoother == "l1jacobi" else lev.inv_diag


def smooth_rx(lev, x, b, params, r=None, want_residual=False,
              x_is_zero=False):
    """One smoother application; returns (x', r') with r' = b − A x'
    (r' is None unless want_residual).

    r: the CURRENT residual b − A x if the caller knows it (pass b when
    x == 0); None → computed here. x_is_zero: promise that x == 0 (the
    V-cycle entry), which lets the fused path skip the x stream entirely.

    When r is None or x_is_zero, the WHOLE application — initial
    residual, recurrence, optional output residual — is one
    op_smooth_apply (one Pallas launch on TPU DIA levels). The known-r,
    x ≠ 0 case (2nd+ pre-smooth sweep) keeps the op_cheb_sweep path.
    """
    if FUSED_APPLY and (r is None or x_is_zero):
        coefs = smoother_coef_rows(lev, params)
        s = smoother_scale_vec(lev, params)
        x2, r2 = op_smooth_apply(lev.a, x, b, s, coefs,
                                 x_zero=x_is_zero, want_res=want_residual)
        return (x2, r2) if want_residual else (x2, None)

    if params.smoother == "chebyshev":
        return _chebyshev_rx(lev, x, b, params, r, want_residual)

    s, scale = _coeffs(lev, params)
    if r is None:
        r = b - op_matvec(lev.a, x)
    d = scale * (s * r)
    if want_residual:
        x, r, _ = op_smooth_step(lev.a, x, r, d, s, 0.0, 0.0)
        return x, r
    return x + d, None


def _chebyshev_rx(lev, x, b, params, r, want_residual):
    """Chebyshev polynomial smoother on D⁻¹A over [f·λ_max, λ_max].

    Standard three-term recurrence (Ifpack2/hypre style); eig_fraction is
    hypre's ChebyshevEigRatio default 0.3.
    """
    degree = params.cheb_degree
    eig_fraction = 0.3
    lmax = lev.lam_max
    lmin = eig_fraction * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    if r is None:
        r = b - op_matvec(lev.a, x)
    d = (lev.inv_diag * r) / theta
    rho = 1.0 / sigma1
    # (c_a, c_b) per recurrence step, built from traced scalars (λ_max
    # lives on device); a trailing (0, 0) row realizes the final
    # residual-producing x/r update. One op_cheb_sweep call = ONE fused
    # Pallas launch for the whole polynomial on TPU DIA levels.
    cdt = lev.inv_diag.dtype
    coef_rows = []
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        coef_rows.append(jnp.stack([
            jnp.asarray(rho_new * rho, dtype=cdt),
            jnp.asarray(2.0 * rho_new / delta, dtype=cdt)]))
        rho = rho_new
    if want_residual:
        coef_rows.append(jnp.zeros((2,), dtype=cdt))
    if not coef_rows:
        return x + d, None
    coefs = jnp.stack(coef_rows)
    x, r, d = op_cheb_sweep(lev.a, x, r, d, lev.inv_diag, coefs)
    if want_residual:
        return x, r
    return x + d, None


def apply_smoother(lev, x, b, params):
    """Single smoother application x ← S(x, b) (residual discarded)."""
    x, _ = smooth_rx(lev, x, b, params)
    return x


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
    """Reference (non-fused) Chebyshev recurrence — kept as the oracle the
    fused smooth_rx path is tested against."""
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
