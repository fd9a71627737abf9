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


class BatchedPCGResult(NamedTuple):
    x: jax.Array           # (B, n)
    niters: jax.Array      # (B,) int32
    history: jax.Array     # (B, maxiter+1)
    converged: jax.Array   # (B,) bool


def pcg_batched(matvec: Callable, precond: Callable, b, x0, *, tol=0.0,
                rtol=0.0, maxiter: int = 100,
                dot: Callable | None = None) -> BatchedPCGResult:
    """Solve A xᵢ = bᵢ for a batch of right-hand sides in ONE fused loop.

    b, x0: (B, n). matvec/precond must accept (B, n) batches (lane-wise
    linear operators — e.g. jax.vmap of the single-vector ops).

    Per-lane semantics are IDENTICAL to `pcg`: a lane's state freezes the
    moment its preconditioned norm drops below its threshold (its α/β are
    forced to 0 and its z/p/norm held), so x/niters/history match a
    lane-by-lane run; the loop exits when every lane is done. The batch
    amortizes the per-op launch latency the small-grid TPU solve is bound
    by — B solves cost ~1 solve's worth of op dispatches.

    tol/rtol may be scalars (shared) or (B,) arrays (per-lane targets —
    a θ-sweep batch passes per-lane thresholds).
    """
    if dot is None:
        dot = lambda u, v: jnp.sum(u * v, axis=-1)
    nrm = lambda v: jnp.sqrt(dot(v, v))
    dtype = b.dtype
    nb = b.shape[0]
    r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = dot(r, z)
    norm0 = nrm(z)
    threshold = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(tol, dtype), (nb,)),
        jnp.asarray(rtol, dtype) * norm0)

    hist = jnp.full((nb, maxiter + 1), jnp.nan, dtype=dtype)
    hist = hist.at[:, 0].set(norm0)
    lanes = jnp.arange(nb)

    def active(k, norm):
        return (norm >= threshold) & (k < maxiter)

    def cond(state):
        _, _, _, _, _, k, _, norm = state
        return jnp.any(active(k, norm))

    def body(state):
        x, r, z, p, rz, k, hist, norm = state
        act = active(k, norm)
        actc = act[:, None]
        ap = matvec(p)
        # frozen lanes: α = β = 0 ⇒ x/r/p unchanged; guard the divisors so
        # a frozen lane's (possibly tiny) rz can't produce inf/NaN
        alpha = jnp.where(act, rz / jnp.where(act, dot(p, ap), 1.0), 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * ap
        z = jnp.where(actc, precond(r), z)
        rz_new = jnp.where(act, dot(r, z), rz)
        beta = jnp.where(act, rz_new / jnp.where(act, rz, 1.0), 0.0)
        p = jnp.where(actc, z + beta[:, None] * p, p)
        norm = jnp.where(act, nrm(z), norm)
        slot = jnp.minimum(k + 1, maxiter)
        hist = hist.at[lanes, slot].set(
            jnp.where(act, norm, hist[lanes, slot]))
        return x, r, z, p, rz_new, k + act.astype(k.dtype), hist, norm

    k0 = jnp.zeros(nb, jnp.int32)
    x, r, z, p, rz, k, hist, norm = jax.lax.while_loop(
        cond, body, (x0, r, z, p, rz, k0, hist, norm0)
    )
    return BatchedPCGResult(x=x, niters=k, history=hist,
                            converged=norm < threshold)
