"""Preconditioned conjugate gradients with reference-parity monitoring.

Semantics mirror the reference's solve entry (common/amg_solver.h:33-56 →
PETSc KSPCG + deal.II SolverControl):

  * monitored/convergence norm = ‖z_k‖₂ = ‖M⁻¹ r_k‖₂, the *preconditioned*
    residual norm PETSc's CG reports in `-ksp_monitor` (the `p_res` column).
  * the history INCLUDES iteration 0 ("residual before doing anything",
    common/amg_solver.h:81-83).
  * convergence test is ABSOLUTE: stop when ‖z_k‖ < tol (deal.II
    SolverControl semantics; SolverControl(n, tol) also caps iterations at
    n — pass maxiter accordingly). A relative test is available via rtol.

The loop is a jitted lax.while_loop; the residual history is written into a
fixed (maxiter+1) buffer (static shape), NaN beyond the converged prefix.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    x: jax.Array
    niters: jax.Array        # int32
    history: jax.Array       # (maxiter+1,) preconditioned residual norms
    converged: jax.Array     # bool


def pcg(matvec: Callable, precond: Callable, b, x0, *, tol=0.0, rtol=0.0,
        maxiter: int = 100, dot: Callable | None = None) -> PCGResult:
    """Solve A x = b with CG preconditioned by `precond` (a linear op).

    Pure/traceable — callers jit the enclosing solve (amg_solver._jit_solve)
    so the hierarchy rides along as a pytree argument and closures don't
    defeat jit caching. tol: absolute threshold on ‖z‖ (0 disables).
    rtol: relative to ‖z_0‖.

    dot: inner product (default jnp.vdot). Inside a shard_map region pass
    a psum-reducing dot so the Krylov scalars are global (dist/structured).
    """
    if dot is None:
        dot = jnp.vdot
    nrm = lambda v: jnp.sqrt(dot(v, v))
    dtype = b.dtype
    r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = dot(r, z)
    norm0 = nrm(z)
    threshold = jnp.maximum(tol, rtol * norm0).astype(dtype)

    hist = jnp.full(maxiter + 1, jnp.nan, dtype=dtype)
    hist = hist.at[0].set(norm0)

    def cond(state):
        x, r, z, p, rz, k, hist, norm = state
        return (norm >= threshold) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k, hist, _ = state
        ap = matvec(p)
        alpha = rz / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        norm = nrm(z)
        hist = hist.at[k + 1].set(norm)
        return x, r, z, p, rz_new, k + 1, hist, norm

    x, r, z, p, rz, k, hist, norm = jax.lax.while_loop(
        cond, body, (x0, r, z, p, rz, jnp.int32(0), hist, norm0)
    )
    return PCGResult(x=x, niters=k, history=hist, converged=norm < threshold)


def cg(matvec, b, x0, *, tol=0.0, rtol=0.0, maxiter=100):
    """Unpreconditioned CG (precond = identity)."""
    return pcg(matvec, lambda r: r, b, x0, tol=tol, rtol=rtol,
               maxiter=maxiter)
