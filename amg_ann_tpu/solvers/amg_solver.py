"""`amg_solve` — the framework's single solve entry point.

Functional analog of the reference's `amg_solver::amg_solve`
(common/amg_solver.h:22-92): takes the assembled system + AMG parameters,
times AMG setup and the PCG solve separately, and returns everything the
reference scrapes out of hypre/PETSc text as first-class values —
iteration count, full preconditioned-residual history (incl. iteration 0),
per-level hierarchy stats, grid/operator/memory complexity.

Differences by design (TPU-first):
  * setup runs on host (data-dependent shapes) building static-shape device
    pytrees; solve is one jitted XLA computation on device.
  * no stdout scraping — stats are return values.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..amg.hierarchy import AMGParams, Hierarchy, setup
from ..sparse.csr import CSR
from .cycle import vcycle
from .krylov import pcg


@dataclasses.dataclass
class SolveResult:
    x: np.ndarray
    niters: int
    p_res: np.ndarray          # preconditioned residual history, iter 0 first
    converged: bool
    t_amg_setup: float         # microseconds (reference unit, amg_solver.h:51)
    t_solve: float             # microseconds
    hierarchy: Hierarchy

    @property
    def rho(self) -> float:
        """Final convergence factor exp(ln(res_k/res_0)/k) — the reference's
        ρ (data_preprocessing.py:73-78)."""
        k = self.niters
        if k < 1:
            return 1.0
        return float(np.exp(np.log(self.p_res[k] / self.p_res[0]) / k))


_SETUP_FIELDS = ("strong_threshold", "max_row_sum",
                 "aggressive_coarsening_num_levels", "max_levels",
                 "max_coarse_size", "trunc_factor", "p_max_elements",
                 "symmetric_operator", "seed", "structured_interp",
                 "dense_coarse_threshold", "device_format")


def _apply_solve_params(hierarchy, params: AMGParams):
    """Honor solve-time apply parameters (smoother, cycle type, sweep
    counts) on a prebuilt hierarchy; reject silent mismatches of
    setup-time parameters — the V-cycle reads params from the hierarchy
    pytree, and without this a caller passing a different smoother to
    amg_solve(hierarchy=...) would silently get the hierarchy's one."""
    old = hierarchy.params
    for f in _SETUP_FIELDS:
        if getattr(old, f) != getattr(params, f):
            raise ValueError(
                f"AMGParams.{f}={getattr(params, f)!r} differs from the "
                f"prebuilt hierarchy's {getattr(old, f)!r}; rebuild the "
                "hierarchy (setup-time parameter)")
    if (params.smoother, params.cycle_type, params.n_pre_smooth,
            params.n_post_smooth, params.cheb_degree) == (
            old.smoother, old.cycle_type, old.n_pre_smooth,
            old.n_post_smooth, old.cheb_degree):
        return hierarchy
    new_device = hierarchy.device.replace(params=params.solve_view())
    if getattr(new_device, "fused_tail", None) is not None:
        # the fused-tail plan bakes in smoother coefficients and sweep
        # counts — rebuild it for the new solve params
        from ..amg.structured_mg import _maybe_fused_tail

        new_device = new_device.replace(fused_tail=_maybe_fused_tail(
            new_device.levels, new_device.coarse_inv, params))
    return dataclasses.replace(hierarchy, device=new_device, params=params)


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _jit_solve(device_h, a_op, b, x0, tol, rtol, maxiter):
    from .ops import op_matvec

    # WELL hierarchies solve in bandwidth-reduced (RCM) variables; the
    # permutation is two O(n) gathers off the iteration hot loop.
    # (structured hierarchies have no perm field — getattr, not attribute)
    perm = getattr(device_h, "perm", None)
    if perm is not None:
        b = jnp.take(b, perm)
        x0 = jnp.take(x0, perm)
    matvec = lambda v: op_matvec(a_op, v)
    precond = lambda r: vcycle(device_h, r)
    res = pcg(matvec, precond, b, x0, tol=tol, rtol=rtol, maxiter=maxiter)
    if perm is not None:
        res = res._replace(x=jnp.take(res.x, device_h.iperm))
    return res


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _jit_solve_batched(device_h, a_op, b, x0, tol, rtol, maxiter):
    from .krylov import pcg_batched
    from .ops import op_matvec

    perm = getattr(device_h, "perm", None)
    if perm is not None:
        b = jnp.take(b, perm, axis=1)
        x0 = jnp.take(x0, perm, axis=1)
    matvec = jax.vmap(lambda v: op_matvec(a_op, v))
    precond = jax.vmap(lambda r: vcycle(device_h, r))
    res = pcg_batched(matvec, precond, b, x0, tol=tol, rtol=rtol,
                      maxiter=maxiter)
    if perm is not None:
        res = res._replace(x=jnp.take(res.x, device_h.iperm, axis=1))
    return res


def amg_solve(a: CSR, b, params: AMGParams | None = None, *, tol: float = 1e-8,
              rtol: float = 0.0, x0=None, maxiter: int | None = None,
              hierarchy=None, grid_shape=None, **kw) -> SolveResult:
    """Solve A x = b by AMG-preconditioned CG.

    tol is the ABSOLUTE threshold on the preconditioned residual norm
    (deal.II SolverControl semantics, reference common/amg_solver.h:33);
    maxiter defaults to min(n, 10·√n + 100) — the reference caps at n but a
    convergent AMG never approaches that, and the history buffer is
    maxiter-sized.
    """
    if params is None:
        params = AMGParams(**kw)
    n = a.nrows
    if maxiter is None:
        maxiter = int(min(n, 10 * np.sqrt(n) + 100))

    t0 = time.perf_counter()
    if hierarchy is None:
        if grid_shape is not None:
            from ..amg.structured_mg import setup_structured

            hierarchy = setup_structured(a, grid_shape, params)
        else:
            hierarchy = setup(a, params)
    else:
        hierarchy = _apply_solve_params(hierarchy, params)
    t_setup = (time.perf_counter() - t0) * 1e6

    from .ops import op_padded_rows

    a_ell = hierarchy.device.levels[0].a
    dtype = a_ell.data.dtype
    # vectors live at the device row count (== n, or the bucket-padded
    # count under AMGParams.shape_buckets / WELL's 1024-row blocks;
    # padded entries stay zero). DIA handles its own internal padding,
    # so its vector length is n.
    n_dev = op_padded_rows(a_ell) or n
    b_np = np.asarray(b)
    if b_np.shape[0] != n_dev:
        b_np = np.concatenate([b_np, np.zeros(n_dev - b_np.shape[0])])
    b_dev = jnp.asarray(b_np, dtype=dtype)
    if x0 is None:
        x0_dev = jnp.zeros_like(b_dev)
    else:
        x0_np = np.asarray(x0)
        if x0_np.shape[0] != n_dev:
            x0_np = np.concatenate(
                [x0_np, np.zeros(n_dev - x0_np.shape[0])])
        x0_dev = jnp.asarray(x0_np, dtype=dtype)

    t0 = time.perf_counter()
    res = _jit_solve(hierarchy.device, a_ell, b_dev, x0_dev,
                     jnp.asarray(tol, dtype=dtype),
                     jnp.asarray(rtol, dtype=dtype), maxiter)
    res.x.block_until_ready()
    t_solve = (time.perf_counter() - t0) * 1e6

    niters = int(res.niters)
    return SolveResult(
        x=np.asarray(res.x)[:n],
        niters=niters,
        p_res=np.asarray(res.history)[: niters + 1],
        converged=bool(res.converged),
        t_amg_setup=t_setup,
        t_solve=t_solve,
        hierarchy=hierarchy,
    )


def amg_solve_batched(a: CSR, bs, params: AMGParams | None = None, *,
                      tol: float = 1e-8, rtol: float = 0.0, x0=None,
                      maxiter: int | None = None, hierarchy=None,
                      grid_shape=None, **kw) -> list[SolveResult]:
    """Solve A xᵢ = bᵢ for a batch of right-hand sides with ONE hierarchy
    and ONE fused device loop (krylov.pcg_batched).

    bs: (B, n). Returns a list of B SolveResults whose x/niters/p_res
    match per-RHS `amg_solve` calls lane for lane (frozen-lane batching —
    no extra iterations leak into a converged lane's state). The reported
    t_solve is the whole batch's wall time; t_amg_setup is paid once.

    This is the serving/time-stepping entry: the small-grid TPU solve is
    op-latency bound, so B solves in one loop cost roughly one solve's
    dispatch overhead. The reference solves strictly one RHS per process
    (common/amg_solver.h:22-92); batching is TPU-native surface area.
    """
    if params is None:
        params = AMGParams(**kw)
    n = a.nrows
    bs_np = np.asarray(bs)
    if bs_np.ndim != 2:
        raise ValueError(f"bs must be (B, n), got {bs_np.shape}")
    if maxiter is None:
        maxiter = int(min(n, 10 * np.sqrt(n) + 100))

    t0 = time.perf_counter()
    if hierarchy is None:
        if grid_shape is not None:
            from ..amg.structured_mg import setup_structured

            hierarchy = setup_structured(a, grid_shape, params)
        else:
            hierarchy = setup(a, params)
    else:
        hierarchy = _apply_solve_params(hierarchy, params)
    t_setup = (time.perf_counter() - t0) * 1e6

    from .ops import op_padded_rows

    a_ell = hierarchy.device.levels[0].a
    dtype = a_ell.data.dtype
    n_dev = op_padded_rows(a_ell) or n
    if bs_np.shape[1] != n_dev:
        bs_np = np.concatenate(
            [bs_np, np.zeros((bs_np.shape[0], n_dev - bs_np.shape[1]))],
            axis=1)
    b_dev = jnp.asarray(bs_np, dtype=dtype)
    if x0 is None:
        x0_dev = jnp.zeros_like(b_dev)
    else:
        x0_np = np.asarray(x0)
        if x0_np.shape[1] != n_dev:
            x0_np = np.concatenate(
                [x0_np, np.zeros((x0_np.shape[0], n_dev - x0_np.shape[1]))],
                axis=1)
        x0_dev = jnp.asarray(x0_np, dtype=dtype)

    t0 = time.perf_counter()
    res = _jit_solve_batched(hierarchy.device, a_ell, b_dev, x0_dev,
                             jnp.asarray(tol, dtype=dtype),
                             jnp.asarray(rtol, dtype=dtype), maxiter)
    res.x.block_until_ready()
    t_solve = (time.perf_counter() - t0) * 1e6

    x_h = np.asarray(res.x)
    niters_h = np.asarray(res.niters)
    hist_h = np.asarray(res.history)
    conv_h = np.asarray(res.converged)
    return [
        SolveResult(
            x=x_h[i, :n], niters=int(niters_h[i]),
            p_res=hist_h[i, : int(niters_h[i]) + 1],
            converged=bool(conv_h[i]), t_amg_setup=t_setup,
            t_solve=t_solve, hierarchy=hierarchy,
        )
        for i in range(x_h.shape[0])
    ]
