"""Mixed-precision iterative refinement: f32 AMG-PCG inner, f64 outer.

The reference reaches 1e-8 relative residuals in IEEE double throughout
(PETSc scalars). On TPU, f64 is software-emulated and slow, while f32 PCG
stalls near 1e-7 relative. The TPU-native resolution is classical iterative
refinement: run the V-cycle-preconditioned CG entirely in fast f32, and
wrap it in an outer Richardson loop whose residual is computed in f64 —
a few emulated-f64 SpMVs against dozens of fast f32 ones.

    x_0 = 0
    repeat:  r = b − A x   (f64)
             solve A d ≈ r with f32 AMG-PCG (relative tol η)
             x ← x + d
    until ‖r‖ ≤ rtol·‖b‖

Converges to f64-level residuals as long as κ(A)·ε_f32 < 1 per sweep.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..amg.hierarchy import AMGParams, Hierarchy, setup
from ..sparse import ell as ell_mod
from ..sparse.csr import CSR
from .amg_solver import _jit_solve


# Outer-residual arithmetic: "f64" = emulated double (original path),
# "ds" = double-single two-f32 Pallas/jnp (sparse/double_single.py —
# no hardware f64 needed, ~f32 speed), "auto" = ds on TPU backends when
# the operator has DIA structure, f64 elsewhere (CPU f64 is native).
IR_RESIDUAL_MODE = "auto"


@dataclasses.dataclass
class IRResult:
    x: np.ndarray
    outer_iters: int
    inner_iters: int           # total f32 PCG iterations
    true_res: float            # final ‖b − Ax‖ / ‖b‖ in f64
    res_history: np.ndarray    # outer (f64) relative residuals
    converged: bool
    t_setup: float             # µs
    t_solve: float             # µs
    hierarchy: Hierarchy


def ir_solve(a: CSR, b, params: AMGParams | None = None, *, rtol=1e-8,
             inner_rtol=1e-4, inner_maxiter=60, max_outer=20,
             hierarchy=None, grid_shape=None, equilibrate=None,
             residual_mode=None, **kw) -> IRResult:
    """Solve A x = b to rtol (f64 true residual) with an f32 hierarchy.

    grid_shape: when given, build the structured (all-banded, gather-free)
    hierarchy instead of classical PMIS — the TPU fast path.

    equilibrate: symmetric diagonal scaling S A S (S = diag(a_ii)^-1/2)
    before the whole refinement. IR converges only while κ(A)·ε_f32 < 1;
    jumping-coefficient operators (ε spans 6 decades in the tc2
    reference sweeps) put κ ~ 1e10 past that wall, and equilibration
    absorbs the coefficient jumps into the scaling. Defaults to on when
    the hierarchy is built here (a prebuilt hierarchy matches the
    UNSCALED operator). Reported true_res is for the ORIGINAL system.
    """
    if params is None:
        params = AMGParams(**kw)
    if params.dtype is None:
        params = dataclasses.replace(params, dtype=np.float32)

    if equilibrate is None:
        equilibrate = hierarchy is None
    a_orig, b_orig = a, np.asarray(b)
    scale = None
    t0 = time.perf_counter()
    if hierarchy is not None and getattr(hierarchy, "_ir_equilibrated",
                                         False):
        raise ValueError(
            "this hierarchy was built by ir_solve on the EQUILIBRATED "
            "operator; reusing it against the original matrix diverges. "
            "Rebuild via setup()/setup_structured() on the matrix you "
            "pass, or call ir_solve without hierarchy=.")
    if equilibrate:
        assert hierarchy is None, \
            "equilibrate rescales A; prebuilt hierarchies don't match"
        d = a.diagonal()
        scale = np.where(
            d != 0, 1.0 / np.sqrt(np.abs(np.where(d == 0, 1.0, d))), 1.0)
        a = a.scale_sym(scale)
        b = b_orig * scale

    if hierarchy is None:
        if grid_shape is not None:
            from ..amg.structured_mg import setup_structured

            hierarchy = setup_structured(a, grid_shape, params)
        else:
            hierarchy = setup(a, params)
        if equilibrate:
            # mark: this hierarchy matches the SCALED operator only
            hierarchy._ir_equilibrated = True
    else:
        from .amg_solver import _apply_solve_params

        hierarchy = _apply_solve_params(hierarchy, params)
    t_setup = (time.perf_counter() - t0) * 1e6

    fn, args, combine = ir_device_args(
        hierarchy, a, np.asarray(b), rtol, inner_rtol=inner_rtol,
        max_outer=max_outer, inner_maxiter=inner_maxiter,
        mode=residual_mode)
    norm_b = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
    if norm_b == 0.0:
        norm_b = 1.0

    t0 = time.perf_counter()
    out = fn(*args)
    x, hist_dev, outers, inners = combine(out)
    # single host sync at the end — the whole refinement ran on device
    x = np.asarray(x)
    t_solve = (time.perf_counter() - t0) * 1e6

    outers = int(outers)
    hist = np.asarray(hist_dev)[: outers + 1] / norm_b
    true_res = float(hist[-1])
    if scale is not None:
        # back to the original variables + honest UNSCALED true residual
        # (host f64 — one CSR matvec)
        x = x * scale
        r = b_orig.astype(np.float64) - a_orig.astype(np.float64).matvec(
            x.astype(np.float64))
        nb0 = float(np.linalg.norm(b_orig))
        true_res = float(np.linalg.norm(r)) / (nb0 if nb0 else 1.0)
    return IRResult(
        x=x, outer_iters=outers,
        inner_iters=int(inners), true_res=true_res,
        res_history=hist, converged=bool(true_res <= rtol),
        t_setup=t_setup, t_solve=t_solve, hierarchy=hierarchy,
    )


def ir_device_args(hierarchy, a, b, rtol, *, inner_rtol=1e-4, max_outer=20,
                   inner_maxiter=60, mode=None):
    """Prepare the one-jit whole-refinement invocation.

    Returns (fn, args, combine): `fn(*args)` runs the complete IR on
    device (re-invocable back-to-back for sustained benchmarking);
    `combine(out)` fetches (x_numpy, hist_device, outers, inners).
    Dispatches the outer-residual arithmetic per IR_RESIDUAL_MODE."""
    x64 = jax.config.read("jax_enable_x64")
    mode = IR_RESIDUAL_MODE if mode is None else mode
    a_ds = None
    if mode in ("ds", "auto"):
        from ..sparse.double_single import from_csr_ds

        a_ds = from_csr_ds(a, max_offsets=128)
        if a_ds is None:
            # no DIA structure (unstructured matrices): double-single on
            # the WELL layout — the gather-free outer residual for the
            # tc1 path (the emulated-f64 ELL gather costs ~150 ms/outer
            # at 36k DoFs on TPU)
            from ..sparse import well as well_mod

            if isinstance(hierarchy.device.levels[0].a, well_mod.WELL):
                a_ds = well_mod.from_csr_ds(a)
        if mode == "ds" and a_ds is None:
            raise ValueError(
                "IR_RESIDUAL_MODE='ds' needs a DIA-structured or WELL "
                "operator")
    use_ds = a_ds is not None and (
        mode == "ds"
        or jax.default_backend() in ("tpu", "axon")
        or not x64)

    a32 = hierarchy.device.levels[0].a
    if use_ds:
        from ..sparse.double_single import ds_split

        ah, al = a_ds
        bh_np, bl_np = ds_split(np.asarray(b, dtype=np.float64))
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and getattr(ah, "cols", 128) == 128)
        args = (hierarchy.device, a32, ah, al, jnp.asarray(bh_np),
                jnp.asarray(bl_np), jnp.float32(rtol),
                jnp.float32(inner_rtol), max_outer, inner_maxiter,
                use_pallas)

        def combine(out):
            xh, xl, hist, outers, inners = out
            x = (np.asarray(xh).astype(np.float64)
                 + np.asarray(xl).astype(np.float64))
            return x, hist, outers, inners

        return _ir_device_ds, args, combine

    if not x64 and rtol < 1e-6:
        # hard requirement, not a hint: without a REAL f64 (or ds) outer
        # residual the Richardson iteration stalls at ~κ·ε_f32 — at 129³
        # jumping-coefficient scale that's far above 1e-8 (round-2 late
        # findings). Failing fast beats a silent non-converging burn.
        raise RuntimeError(
            "ir_solve: jax_enable_x64 is off and the operator has no DIA "
            "structure for the double-single residual, so the outer "
            f"residual would run in f32 — rtol={rtol:g} is unreachable "
            "on ill-conditioned systems. Enable x64 first "
            '(jax.config.update("jax_enable_x64", True)), or relax '
            "rtol to ≥1e-6 for a single-precision solve.")
    # f64 outer residual: use the banded (gather-free) path when the
    # matrix has DIA structure — the emulated-f64 gather SpMV would
    # otherwise dominate the whole solve on TPU
    from ..sparse.dia import from_csr_dia

    hi_dtype = jnp.float64 if x64 else jnp.float32
    a_hi = from_csr_dia(a, dtype=hi_dtype, max_offsets=64)
    if a_hi is None:
        a_hi = ell_mod.from_csr(a, dtype=hi_dtype)
    b_hi = jnp.asarray(np.asarray(b), dtype=hi_dtype)
    args = (hierarchy.device, a32, a_hi, b_hi, jnp.asarray(rtol, hi_dtype),
            jnp.float32(inner_rtol), max_outer, inner_maxiter)

    def combine(out):
        x, hist, outers, inners = out
        return np.asarray(x), hist, outers, inners

    return _ir_device, args, combine


@functools.partial(jax.jit, static_argnames=("max_outer", "inner_maxiter",
                                             "use_pallas"))
def _ir_device_ds(device_h, a32, ah, al, bh, bl, rtol, inner_rtol,
                  max_outer, inner_maxiter, use_pallas):
    """Whole iterative refinement with the double-single (two-f32) outer
    residual — no f64 anywhere (TPU-native; works with x64 off)."""
    from ..sparse.double_single import (dia_residual_ds,
                                        dia_residual_ds_ref, ds_add)
    from ..sparse.well import WELL, residual_ds as well_residual_ds

    norm_b = jnp.linalg.norm(bh)
    norm_b = jnp.where(norm_b == 0, 1.0, norm_b).astype(jnp.float32)
    hist = jnp.full(max_outer + 1, jnp.nan, dtype=jnp.float32)
    hist = hist.at[0].set(norm_b)

    def residual(xh, xl):
        if isinstance(ah, WELL):
            return well_residual_ds(ah, al, xh, xl, bh, bl)
        if use_pallas:
            return dia_residual_ds(ah, al, xh, xl, bh, bl)
        return dia_residual_ds_ref(ah, al, xh, xl, bh, bl)

    from .ops import op_padded_rows

    n = bh.shape[0]
    nd = op_padded_rows(a32) or n     # device vector length (WELL pads)

    def _inner(r):
        rp = (r if nd == n else
              jnp.concatenate([r, jnp.zeros(nd - n, dtype=r.dtype)]))
        res = _jit_solve(device_h, a32, rp,
                         jnp.zeros(rp.shape, dtype=jnp.float32),
                         jnp.float32(0.0), inner_rtol, inner_maxiter)
        return res._replace(x=res.x if nd == n else res.x[:n])

    def cond(state):
        xh, xl, rh, rl, k, inner, h = state
        return (jnp.linalg.norm(rh) > rtol * norm_b) & (k < max_outer)

    def body(state):
        xh, xl, rh, rl, k, inner, h = state
        res = _inner(rh)
        xh, xl = ds_add(xh, xl, res.x, jnp.zeros_like(res.x))
        rh, rl = residual(xh, xl)
        h = h.at[k + 1].set(jnp.linalg.norm(rh))
        return xh, xl, rh, rl, k + 1, inner + res.niters, h

    z = jnp.zeros_like(bh)
    state = (z, z, bh, bl, jnp.int32(0), jnp.int32(0), hist)
    xh, xl, rh, rl, k, inner, hist = jax.lax.while_loop(cond, body, state)
    return xh, xl, hist, k, inner


@functools.partial(jax.jit, static_argnames=("max_outer", "inner_maxiter"))
def _ir_device(device_h, a32, a_hi, b_hi, rtol, inner_rtol, max_outer,
               inner_maxiter):
    """The whole iterative refinement as ONE device computation: outer
    Richardson in high precision around the f32 AMG-PCG while_loop."""
    from .ops import op_matvec

    hi = b_hi.dtype
    norm_b = jnp.linalg.norm(b_hi)
    norm_b = jnp.where(norm_b == 0, 1.0, norm_b)
    hist = jnp.full(max_outer + 1, jnp.nan, dtype=hi)
    r0 = b_hi
    hist = hist.at[0].set(jnp.linalg.norm(r0))

    from .ops import op_padded_rows

    n = b_hi.shape[0]
    nd = op_padded_rows(a32) or n     # device vector length (WELL pads)

    def cond(state):
        x, r, k, inner, h = state
        return (jnp.linalg.norm(r) > rtol * norm_b) & (k < max_outer)

    def body(state):
        x, r, k, inner, h = state
        r32 = r.astype(jnp.float32)
        if nd != n:
            r32 = jnp.concatenate(
                [r32, jnp.zeros(nd - n, dtype=jnp.float32)])
        res = _jit_solve(device_h, a32, r32,
                         jnp.zeros(r32.shape, dtype=jnp.float32),
                         jnp.float32(0.0), inner_rtol, inner_maxiter)
        dx = res.x if nd == n else res.x[:n]
        x = x + dx.astype(hi)
        r = b_hi - op_matvec(a_hi, x)
        h = h.at[k + 1].set(jnp.linalg.norm(r))
        return x, r, k + 1, inner + res.niters, h

    x0 = jnp.zeros_like(b_hi)
    x, r, k, inner, hist = jax.lax.while_loop(
        cond, body, (x0, r0, jnp.int32(0), jnp.int32(0), hist))
    return x, hist, k, inner
