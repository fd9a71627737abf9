"""Extremal-eigenvalue solvers — native replacement for the reference's
SLEPc usage (testcase2.1 main.cpp:282-327: Arnoldi / KrylovSchur / LAPACK
over EPS_SMALLEST_REAL / LARGEST_REAL / SMALLEST_MAGNITUDE).

TPU-native path: jitted Lanczos with full reorthogonalization on the ELL
SpMV (lax.scan over a static iteration count), extremal Ritz values from
the small tridiagonal on host. Dense fallback (jnp.linalg.eigvalsh, lands
on the MXU) for small systems — the LAPACK analog.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse import ell as ell_mod
from ..sparse.csr import CSR


class EigenResult(NamedTuple):
    lam_min: float          # smallest real
    lam_max: float          # largest real
    lam_abs_min: float      # smallest magnitude
    lam_abs_max: float      # largest magnitude
    n_iter: int


@functools.partial(jax.jit, static_argnames=("m",))
def _lanczos(a_ell, v0, m: int):
    """m-step Lanczos with full reorthogonalization.

    Returns (alpha, beta) of the tridiagonal T. Full reorth is O(m·n·m)
    flops of dense matvecs — MXU-friendly and necessary for accurate
    extremal Ritz values at small m.
    """
    n = v0.shape[0]
    dtype = v0.dtype
    V = jnp.zeros((m + 1, n), dtype=dtype)
    v = v0 / jnp.linalg.norm(v0)
    V = V.at[0].set(v)

    def body(carry, i):
        V, beta_prev = carry
        v = V[i]
        w = ell_mod.spmv(a_ell, v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - jnp.where(i > 0, beta_prev, 0.0) * V[i - 1]
        # full reorthogonalization against all previous vectors (mask the
        # not-yet-filled rows)
        mask = (jnp.arange(m + 1) <= i).astype(dtype)
        coeffs = (V @ w) * mask
        w = w - V.T @ coeffs
        beta = jnp.linalg.norm(w)
        # happy-breakdown guard: a numerically-zero beta means an invariant
        # subspace — stop feeding garbage directions into V
        tiny = 1e-12 * jnp.maximum(jnp.abs(alpha), 1.0)
        v_next = jnp.where(beta > tiny,
                           w / jnp.where(beta == 0, 1.0, beta), 0.0)
        V = V.at[i + 1].set(v_next)
        return (V, beta), (alpha, beta)

    (_, _), (alphas, betas) = jax.lax.scan(
        body, (V, jnp.asarray(0.0, dtype)), jnp.arange(m))
    return alphas, betas


def lanczos_extremal(a: CSR | ell_mod.ELL, m: int = 100,
                     seed: int = 0) -> EigenResult:
    """Extremal eigenvalues of symmetric A by Lanczos."""
    a_ell = ell_mod.from_csr(a) if isinstance(a, CSR) else a
    n = a_ell.ncols
    m = min(m, n)
    rng = np.random.default_rng(seed)
    v0 = jnp.asarray(rng.standard_normal(n), dtype=a_ell.data.dtype)
    alphas, betas = _lanczos(a_ell, v0, m)
    alphas = np.asarray(alphas)
    betas = np.asarray(betas)
    # the f32 recurrence can diverge on κ ≳ 1e7 operators: fail fast
    # with guidance when x64 is off (a truncated-garbage Ritz estimate
    # silently poisons downstream θ-sweeps); under x64 a non-finite tail
    # is a pathological matrix — truncate to the usable prefix
    finite = np.isfinite(alphas) & np.isfinite(betas)
    if not finite.all():
        if not jax.config.read("jax_enable_x64"):
            raise RuntimeError(
                "lanczos_extremal: non-finite recurrence coefficients at "
                f"step {int(np.flatnonzero(~finite)[0])} — the f32 "
                "Lanczos recurrence diverged (κ ≳ 1e7). Enable x64 "
                'first: jax.config.update("jax_enable_x64", True).')
        m = max(int(np.flatnonzero(~finite)[0]), 1)
        alphas, betas = alphas[:m], betas[:m]
    # truncate at the first (near-)breakdown — T beyond it is meaningless
    scale = max(np.abs(alphas).max(), 1.0)
    small = np.flatnonzero(betas < 1e-12 * scale)
    k = int(small[0]) + 1 if small.size else m
    t = np.diag(alphas[:k])
    off = betas[: k - 1]
    t += np.diag(off, 1) + np.diag(off, -1)
    ritz = np.linalg.eigvalsh(t)
    return EigenResult(
        lam_min=float(ritz[0]), lam_max=float(ritz[-1]),
        lam_abs_min=float(np.abs(ritz).min()),
        lam_abs_max=float(np.abs(ritz).max()),
        n_iter=m,
    )


def dense_extremal(a: CSR) -> EigenResult:
    """Dense symmetric eigensolve (the reference's SolverLAPACK analog)."""
    w = np.asarray(jnp.linalg.eigvalsh(jnp.asarray(a.to_dense())))
    return EigenResult(float(w[0]), float(w[-1]),
                       float(np.abs(w).min()), float(np.abs(w).max()),
                       n_iter=a.nrows)
