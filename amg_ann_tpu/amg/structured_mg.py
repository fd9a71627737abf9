"""Structured Galerkin multigrid — the all-DIA TPU fast path.

For operators assembled on structured interior grids (the reference's
entire benchmark surface: testcase2/2.1 structured cubes, the 7-point FD
problems), classical PMIS coarsening destroys bandedness and forces the
solve onto gather-SpMV, which XLA executes ~600× below HBM speed-of-light
on TPU. This mode instead coarsens GEOMETRICALLY (every second node per
axis) while keeping the operator algebra GALERKIN (A_{l+1} = Pᵀ A_l P) —
hypre ships PFMG for exactly this reason. Every level's operator stays a
banded matrix ⇒ the whole V-cycle runs on shifted vector multiply-adds
(DIA / Pallas) with zero gathers.

Two interpolation modes (AMGParams.structured_interp):

  * "operator" (default): θ-SENSITIVE operator-induced weights with
    hypre-style strength filtering and max_row_sum weakening (amg/boxmg.py)
    — the strong-threshold parameter the whole framework predicts
    (reference common/amg_solver.h:30) steers this path directly. Both
    setup (stencil-algebra RAP, no SpGEMM) and solve run on ≤27-offset
    stencils; hierarchy SHAPES are θ-independent, so θ-sweeps reuse one
    compiled solve per grid size. Requires a ≤3³-reach fine operator
    (Q1/7-point); wider stencils fall back to:
  * "trilinear": fixed geometric trilinear P / full-weighting R, Galerkin
    RAP via host CSR SpGEMM — θ-blind, but supports any banded operator
    (degree ≥ 2 FEM: 125-point stencils).

Callers choose the structured path explicitly: `amg_solve(...,
grid_shape=...)` / `ir_solve(..., grid_shape=...)`; without grid_shape the
classical PMIS path (amg/hierarchy.py) is used.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..sparse.csr import CSR
from ..sparse.dia import DIA, from_csr_dia
from ..sparse.spgemm import spgemm
from .boxmg import (choose_strides, csr_to_stencil, interp_csr,
                    interp_weights, rap_stencil, stencil_diag_stats,
                    stencil_lam_max, stencil_to_csr, stencil_to_dia)
from .hierarchy import AMGParams, HierarchyStats, _estimate_lam_max
from .transfer import coarse_size, prolongation_csr, transfer_dia


# levels at or above this node count drop the (27, n) p_w array once the
# DIA-form transfers are built (they carry the same weights): at 256³ the
# fine-level p_w alone is 1.8 GB of HBM
_P_W_DROP_ROWS = 8_000_000


def _want_transfer_dia(shape) -> bool:
    """Build the DIA-form transfers for a level: levels big enough for the
    Pallas kernels, on accelerator backends (the CPU oracle path keeps the
    pad/slice transfers; nothing would read the extra bands there)."""
    from ..solvers.ops import PALLAS_MIN_ROWS

    return (int(np.prod(shape)) >= PALLAS_MIN_ROWS
            and jax.default_backend() in ("tpu", "axon"))


@struct.dataclass
class StructuredLevel:
    a: DIA
    inv_diag: jax.Array
    inv_l1: jax.Array
    lam_max: jax.Array
    shape: tuple = struct.field(pytree_node=False)  # (nx, ny, nz)
    # operator-induced prolongation weights (27, nx, ny, nz); None on the
    # trilinear path and on the coarsest level
    p_w: Optional[jax.Array] = None
    # per-axis coarsening strides toward the NEXT level (θ-driven
    # semicoarsening); (2, 2, 2) = full coarsening
    strides: tuple = struct.field(pytree_node=False, default=(2, 2, 2))
    # DIA-form transfers (amg/transfer.transfer_dia): the same weights as
    # masked banded operators so P/R run as ONE Pallas launch each on TPU
    # instead of ~80-op pad/slice chains; None where p_w is None or the
    # level is too small to use the kernels
    p_dia: Optional[DIA] = None
    r_dia: Optional[DIA] = None


@struct.dataclass
class BlockStructuredLevel:
    """Vector (nb-component) level — unknown-based block path
    (amg/boxmg_block.py). The operator is a scalar interleaved DIA
    (node·nb + component ordering), so smoothers and PCG ride the
    existing DIA/Pallas kernels; only the transfers are block-aware."""
    a: DIA
    inv_diag: jax.Array
    inv_l1: jax.Array
    lam_max: jax.Array
    shape: tuple = struct.field(pytree_node=False)  # NODE grid (nx, ny, nz)
    nb: int = struct.field(pytree_node=False, default=3)
    # per-component prolongation weights (nb, 27, nx, ny, nz)
    p_w: Optional[jax.Array] = None
    strides: tuple = struct.field(pytree_node=False, default=(2, 2, 2))


@struct.dataclass
class StructuredHierarchy:
    levels: tuple
    coarse_inv: jax.Array
    params: AMGParams = struct.field(pytree_node=False)
    # fused coarse-tail plan (sparse/pallas_cycle.py): the whole
    # sub-V-cycle below level fused_tail.l0 runs as ONE Pallas launch on
    # TPU; None when the tail doesn't qualify (W-cycle, odd shapes whose
    # transfer maps don't decompose, non-f32, block levels)
    fused_tail: object = None


def _maybe_fused_tail(levels, coarse_inv, params):
    """Build the fused-tail plan when the backend will use it.

    Gate: AMG_FUSED_TAIL env — "auto" (default: TPU backends only),
    "1"/"force" (always build — tests exercise the kernel in interpret
    mode on CPU), "0" (never)."""
    import os

    mode = os.environ.get("AMG_FUSED_TAIL", "auto")
    if mode in ("0", "never"):
        return None
    if mode == "auto" and jax.default_backend() not in ("tpu", "axon"):
        return None
    from ..sparse.pallas_cycle import build_fused_tail

    try:
        return build_fused_tail(levels, coarse_inv, params)
    except Exception:
        return None


@dataclasses.dataclass
class StructuredSetupResult:
    device: StructuredHierarchy
    stats: HierarchyStats
    params: AMGParams
    # operator path: per-level host stencils / weight stencils
    stencils: Optional[list] = None
    weights: Optional[list] = None
    # trilinear path fills these eagerly; operator path materializes the
    # equivalent CSR matrices lazily (tests / parity artifacts only)
    a_mats_eager: Optional[list] = None
    p_mats_eager: Optional[list] = None
    # block (vector) path: per-level (27, nb, nb, …) stencils
    block_stencils: Optional[list] = None

    @property
    def a_mats(self) -> list:
        if self.a_mats_eager is None:
            if self.block_stencils is not None:
                from .boxmg_block import block_stencil_to_csr

                self.a_mats_eager = [block_stencil_to_csr(np.asarray(s))
                                     for s in self.block_stencils]
            else:
                self.a_mats_eager = [stencil_to_csr(np.asarray(s))
                                     for s in self.stencils]
        return self.a_mats_eager

    strides: Optional[list] = None  # per-level coarsening patterns

    @property
    def p_mats(self) -> list:
        if self.p_mats_eager is None:
            # big-level device weights may have been dropped to save HBM
            # (_P_W_DROP_ROWS) — rebuild them from the kept stencils
            ws = []
            for l, w in enumerate(self.weights):
                if w is None:
                    w = _interp_fn_host(self.params)(
                        np.asarray(self.stencils[l]),
                        self.params.strong_threshold,
                        self.params.max_row_sum, self.strides[l])
                ws.append(w)
            self.p_mats_eager = [interp_csr(np.asarray(w), st) for w, st in
                                 zip(ws, self.strides)]
        return self.p_mats_eager


def _interp_fn_host(params: AMGParams):
    """Host weight builder for params.structured_interp ('boxmg' |
    'operator'); the trilinear mode never reaches the stencil path."""
    from .boxmg import interp_weights_boxmg

    return (interp_weights_boxmg if params.structured_interp == "boxmg"
            else interp_weights)


def _dense_inverse(coarse_csr: CSR) -> np.ndarray:
    coarse = coarse_csr.to_dense().astype(np.float64)
    try:
        return np.linalg.inv(coarse)
    except np.linalg.LinAlgError:
        return np.linalg.pinv(coarse)


def _setup_operator_wide(a: CSR, s5: np.ndarray, grid_shape,
                         params: AMGParams, dtype) -> StructuredSetupResult:
    """5³-reach (degree-2 FEM) fine level: p-coarsen onto the vertex
    grid with the tensor Q2→Q1 prolongation, Galerkin-restrict the
    125-point operator to a 27-point vertex stencil (amg/wide.py), then
    run the unchanged θ-sensitive operator path below. The wide fine
    level solves as a plain (125-offset) DIA operator — no new kernels.
    Reference parity: tc2 degree-2/3 sweeps,
    testcase2-diffusion-structured/datagen.py:29-52."""
    from .wide import (K5_CENTER, rap_stencil_wide, stencil_to_dia_wide,
                       trilinear_weights_wide)

    t0 = time.perf_counter()
    shape0 = tuple(grid_shape)
    w0 = trilinear_weights_wide(shape0, np.dtype(dtype))
    s1 = rap_stencil_wide(s5, w0).astype(dtype)
    vshape = tuple(n // 2 for n in shape0)

    inner = _setup_operator(a, s1, vshape, params, dtype)

    # level-0 arrays from the wide stencil
    diag = s5[K5_CENTER].reshape(-1)
    absum = np.abs(s5).sum(axis=0).reshape(-1)
    inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
    inv_l1 = np.where(absum != 0, 1.0 / np.where(absum == 0, 1, absum), 0.0)
    lam = float(np.max(absum * np.abs(inv_diag))) if diag.size else 1.0
    p_dia = r_dia = None
    if _want_transfer_dia(shape0):
        p_dia, r_dia = transfer_dia(jnp.asarray(w0, dtype=dtype), shape0,
                                    (2, 2, 2))
    lev0 = StructuredLevel(
        a=stencil_to_dia_wide(s5, dtype=dtype),
        inv_diag=jnp.asarray(inv_diag, dtype=dtype),
        inv_l1=jnp.asarray(inv_l1, dtype=dtype),
        lam_max=jnp.asarray(lam if lam > 0 else 1.0, dtype=dtype),
        shape=shape0,
        p_w=jnp.asarray(w0, dtype=dtype),
        strides=(2, 2, 2), p_dia=p_dia, r_dia=r_dia,
    )
    levels = (lev0,) + inner.device.levels
    device = StructuredHierarchy(
        levels=levels, coarse_inv=inner.device.coarse_inv,
        params=params.solve_view(),
        fused_tail=_maybe_fused_tail(list(levels),
                                     inner.device.coarse_inv, params),
    )
    nnz0 = int(np.count_nonzero(s5))
    rows = [int(np.prod(shape0))] + inner.stats.rows
    nnz = [nnz0] + inner.stats.nnz
    p_nnz = int(np.count_nonzero(w0)) + sum(
        int(np.count_nonzero(w)) for w in inner.weights)
    stats = HierarchyStats(
        n_levels=len(rows), rows=rows, nnz=nnz,
        sparsity=[z / max(r, 1) for z, r in zip(nnz, rows)],
        grid_complexity=sum(rows) / max(rows[0], 1),
        operator_complexity=sum(nnz) / max(nnz[0], 1),
        memory_complexity=(sum(nnz) + p_nnz) / max(nnz[0], 1),
    )
    stats.t_setup = time.perf_counter() - t0
    return StructuredSetupResult(
        device, stats, params,
        stencils=[s1] + inner.stencils,       # 27-pt levels (oracles)
        weights=[w0] + inner.weights,
        strides=[(2, 2, 2)] + inner.strides)


def _setup_operator(a: CSR, s0: np.ndarray, grid_shape, params: AMGParams,
                    dtype) -> StructuredSetupResult:
    """θ-sensitive path: stencil hierarchy, stencil-algebra RAP."""
    t0 = time.perf_counter()
    stencils = [s0]
    weights = []
    stride_list = []
    shapes = [tuple(grid_shape)]
    while (int(np.prod(shapes[-1])) > params.max_coarse_size
           and len(stencils) < params.max_levels
           and max(shapes[-1]) >= 2):
        strides = choose_strides(stencils[-1], params.strong_threshold)
        if 2 not in strides:
            break
        w = _interp_fn_host(params)(stencils[-1], params.strong_threshold,
                                    params.max_row_sum, strides)
        stencils.append(rap_stencil(stencils[-1], w, strides))
        weights.append(w)
        stride_list.append(strides)
        shapes.append(tuple(coarse_size(s) if st == 2 else s
                            for s, st in zip(shapes[-1], strides)))

    rows = [int(np.prod(sh)) for sh in shapes]
    nnz = [int(np.count_nonzero(s)) for s in stencils]
    p_nnz = sum(int(np.count_nonzero(w)) for w in weights)
    stats = HierarchyStats(
        n_levels=len(stencils), rows=rows, nnz=nnz,
        sparsity=[z / max(r, 1) for z, r in zip(nnz, rows)],
        grid_complexity=sum(rows) / max(rows[0], 1),
        operator_complexity=sum(nnz) / max(nnz[0], 1),
        memory_complexity=(sum(nnz) + p_nnz) / max(nnz[0], 1),
    )

    levels = []
    for l, (s_l, shape) in enumerate(zip(stencils, shapes)):
        inv_diag, inv_l1, _ = stencil_diag_stats(s_l)
        lam = stencil_lam_max(s_l, inv_diag)
        has_next = l < len(stencils) - 1
        p_dia = r_dia = None
        p_w_dev = None
        if has_next:
            w_dev = jnp.asarray(weights[l], dtype=dtype)
            if _want_transfer_dia(shape):
                p_dia, r_dia = transfer_dia(w_dev, shape, stride_list[l])
                # big levels: the DIA transfers carry the weights — drop
                # the redundant (27, n) p_w copy (1.8 GB of HBM at 256³)
                if int(np.prod(shape)) < _P_W_DROP_ROWS:
                    p_w_dev = w_dev
            else:
                p_w_dev = w_dev
        levels.append(StructuredLevel(
            a=stencil_to_dia(s_l, dtype=dtype, keep_all_slots=(l > 0)),
            inv_diag=jnp.asarray(inv_diag, dtype=dtype),
            inv_l1=jnp.asarray(inv_l1, dtype=dtype),
            lam_max=jnp.asarray(lam, dtype=dtype),
            shape=shape,
            p_w=p_w_dev,
            strides=stride_list[l] if has_next else (2, 2, 2),
            p_dia=p_dia, r_dia=r_dia,
        ))
    coarse_inv = _dense_inverse(stencil_to_csr(stencils[-1]))
    coarse_inv_dev = jnp.asarray(coarse_inv.astype(dtype))
    device = StructuredHierarchy(
        levels=tuple(levels),
        coarse_inv=coarse_inv_dev,
        params=params.solve_view(),
        fused_tail=_maybe_fused_tail(levels, coarse_inv_dev, params),
    )
    stats.t_setup = time.perf_counter() - t0
    return StructuredSetupResult(device, stats, params, stencils=stencils,
                                 weights=weights, strides=stride_list)


@functools.partial(jax.jit, static_argnames=("shape", "slots", "interp",
                                              "mrs", "schedule"))
def _setup_chain_dev(s0, theta, *, shape, slots, interp, mrs, schedule):
    """The WHOLE device setup chain — coarsening, interpolation, RAP,
    level stats, DIA packing, transfers, dense coarse inverse — as ONE
    jitted executable per (shape, slots, schedule).

    `schedule` is the STATIC per-level stride plan (a trailing None entry
    = scheduled stop, whose coupling is still emitted so the caller can
    verify the stop). θ rides traced, so one executable serves a whole
    sweep. Round-3 ran this as ~7 separately-dispatched executables per
    level; through the axon tunnel each dispatch costs tens of ms, which
    made warm setup ~3 s at 128³ and ~10 s on the tc3 block path — the
    one-launch form is the round-4 setup-time attack (VERDICT item 7)."""
    from .boxmg_device import (axis_couplings_dev, dense_from_stencil_dev,
                               interp_weights_boxmg_dev, interp_weights_dev,
                               lam_power_dev, level_stats_dev, nnz_count_dev,
                               rap_stencil_dev, stencil_to_dia_dev)

    interp_dev = (interp_weights_boxmg_dev if interp == "boxmg"
                  else interp_weights_dev)
    stencils, weights = [s0], []
    slot_list = [tuple(slots)]
    shapes = [tuple(shape)]
    coup_devs = []
    for strides in schedule:
        coup_devs.append(axis_couplings_dev(stencils[-1]))
        if strides is None:          # scheduled stop (verified by caller)
            break
        w = interp_dev(stencils[-1], theta, strides=strides, mrs=mrs)
        s_c = rap_stencil_dev(stencils[-1], w, strides=strides,
                              a_slots=slot_list[-1])
        # materialize each level's (A_c, W) before any consumer: without
        # this barrier XLA fuses the DIA-pack/transfer bands into their
        # producers and RECOMPUTES the interp/RAP expressions per band —
        # measured 1.89 s vs 0.14 s chain device time at 128³ (r5 bisect,
        # bench/TPU_RUNBOOK.md)
        s_c, w = jax.lax.optimization_barrier((s_c, w))
        stencils.append(s_c)
        weights.append(w)
        slot_list.append(tuple(range(27)))
        shapes.append(tuple(coarse_size(s) if st == 2 else s
                            for s, st in zip(shapes[-1], strides)))

    stride_real = [st for st in schedule if st is not None]
    levels, nnz_dev = [], []
    for l, (s_l, sh) in enumerate(zip(stencils, shapes)):
        inv_diag, inv_l1, lam = level_stats_dev(s_l)
        # small (coarse Galerkin) levels: Gershgorin is loose there —
        # power-iterate on device (host-path policy). Env knob = setup
        # A/B attribution lever (bench/setup_marginal_tpu.py)
        if int(np.prod(sh)) <= int(os.environ.get("AMG_LAM_POWER_MAX",
                                                  "100000")):
            lam = lam_power_dev(s_l, inv_diag)
        data, offs = stencil_to_dia_dev(s_l, sh, slots=slot_list[l])
        has_next = l < len(stencils) - 1
        p_dia = r_dia = None
        p_w_dev = None
        if has_next:
            p_w_dev = weights[l]
            if _want_transfer_dia(sh):
                p_dia, r_dia = transfer_dia(weights[l], sh, stride_real[l])
                if int(np.prod(sh)) >= _P_W_DROP_ROWS:
                    p_w_dev = None     # DIA transfers carry the weights
                    weights[l] = None  # free the 27·n device buffer
        levels.append(StructuredLevel(
            a=DIA(data=data, offsets=offs, n=int(np.prod(sh)), nnz=0),
            inv_diag=inv_diag, inv_l1=inv_l1, lam_max=lam,
            shape=sh,
            p_w=p_w_dev,
            strides=stride_real[l] if has_next else (2, 2, 2),
            p_dia=p_dia, r_dia=r_dia,
        ))
        nnz_dev.append(nnz_count_dev(s_l))
    coarse = dense_from_stencil_dev(stencils[-1], shapes[-1])
    return (tuple(stencils), tuple(weights), tuple(levels),
            tuple(coup_devs), tuple(nnz_dev), jnp.linalg.inv(coarse))


def _setup_operator_device(s0_dev, grid_shape, params: AMGParams, dtype,
                           a_slots) -> StructuredSetupResult:
    """θ-sensitive setup computed ON DEVICE (amg/boxmg_device.py).

    The only host↔device traffic: the fine stencil upload (done by the
    caller, θ-independent) and ONE combined fetch of the coupling
    scalars + nnz stats per attempt. The chain runs speculatively under
    a static stride schedule (full coarsening first); if the fetched
    couplings disagree with the schedule, the schedule is corrected at
    the first diverging level and the chain re-launched — each attempt
    extends the verified prefix, so it terminates in ≤ n_levels
    launches, and every (shape, schedule) executable is jit-cached, so
    anisotropic θ-sweeps reuse a handful of executables.
    """
    import jax as _jax

    from .boxmg import strides_from_couplings

    t0 = time.perf_counter()
    theta = params.strong_threshold
    theta_t = jnp.asarray(theta, dtype=s0_dev.dtype)
    shape0 = tuple(int(x) for x in grid_shape)

    def apply_st(sh, st):
        return tuple(coarse_size(s) if t == 2 else s
                     for s, t in zip(sh, st))

    def full_schedule(prefix):
        sched = list(prefix)
        sh = shape0
        for st in sched:
            sh = apply_st(sh, st)
        while (int(np.prod(sh)) > params.max_coarse_size
               and len(sched) + 1 < params.max_levels and max(sh) >= 2):
            st = tuple(2 if n >= 2 else 1 for n in sh)
            if 2 not in st:
                break
            sched.append(st)
            sh = apply_st(sh, st)
        return tuple(sched)

    schedule = full_schedule([])
    for _attempt in range(params.max_levels + 2):
        (stencils, weights, levels, coup_devs, nnz_dev,
         coarse_inv) = _setup_chain_dev(
            s0_dev, theta_t, shape=shape0, slots=tuple(a_slots),
            interp=params.structured_interp, mrs=params.max_row_sum,
            schedule=schedule)
        coups, nnz_host = _jax.device_get((coup_devs, nnz_dev))
        shapes = [shape0]
        for st in schedule:
            if st is None:
                break
            shapes.append(apply_st(shapes[-1], st))
        bad = want_bad = None
        for l, c in enumerate(coups):
            want = strides_from_couplings(np.asarray(c), theta, shapes[l])
            if want is not None and 2 not in want:
                want = None
            sched_l = schedule[l] if l < len(schedule) else None
            if want != sched_l:
                bad, want_bad = l, want
                break
        if bad is None:
            break
        prefix = list(schedule[:bad])
        schedule = (tuple(prefix) + (None,) if want_bad is None
                    else full_schedule(prefix + [want_bad]))
    stride_list = [st for st in schedule if st is not None]
    shapes = [shape0]
    for st in stride_list:
        shapes.append(apply_st(shapes[-1], st))
    weights = list(weights)
    stencils = list(stencils)
    nnz = [int(v) for v in nnz_host]
    p_nnz_est = sum(27 * int(np.prod(sh))          # upper bound (27·n per
                    for sh in shapes[:-1])         # level with a next one)
    rows = [int(np.prod(sh)) for sh in shapes]
    stats = HierarchyStats(
        n_levels=len(stencils), rows=rows, nnz=nnz,
        sparsity=[z / max(r, 1) for z, r in zip(nnz, rows)],
        grid_complexity=sum(rows) / max(rows[0], 1),
        operator_complexity=sum(nnz) / max(nnz[0], 1),
        memory_complexity=(sum(nnz) + p_nnz_est) / max(nnz[0], 1),
    )
    device = StructuredHierarchy(
        levels=tuple(levels), coarse_inv=coarse_inv,
        params=params.solve_view(),
        fused_tail=_maybe_fused_tail(levels, coarse_inv, params))
    stats.t_setup = time.perf_counter() - t0
    return StructuredSetupResult(device, stats, params,
                                 stencils=stencils, weights=weights,
                                 strides=stride_list)


def _setup_trilinear(a: CSR, grid_shape, params: AMGParams,
                     dtype) -> StructuredSetupResult:
    """θ-blind fallback: fixed trilinear P, Galerkin RAP via CSR SpGEMM.

    Handles any banded operator (e.g. 125-point degree-2 stencils that the
    3³ stencil algebra cannot represent)."""
    t0 = time.perf_counter()
    from .hierarchy import _make_stats

    a_mats = [a.astype(dtype)]
    p_mats = []
    shapes = [tuple(grid_shape)]
    while (a_mats[-1].nrows > params.max_coarse_size
           and len(a_mats) < params.max_levels
           and min(shapes[-1]) >= 2):
        p = prolongation_csr(shapes[-1])
        r = p.transpose()
        a_c = spgemm(r, spgemm(a_mats[-1], p))
        p_mats.append(p)
        a_mats.append(a_c)
        shapes.append(tuple(coarse_size(s) for s in shapes[-1]))

    stats = _make_stats(a_mats, p_mats)
    levels = []
    for a_l, shape in zip(a_mats, shapes):
        dia = from_csr_dia(a_l, dtype=dtype)
        assert dia is not None, "structured level lost bandedness"
        diag = a_l.diagonal()
        inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
        rows, _, vals = a_l.row_expand()
        l1 = np.bincount(rows, weights=np.abs(vals), minlength=a_l.nrows)
        inv_l1 = np.where(l1 != 0, 1.0 / np.where(l1 == 0, 1, l1), 0.0)
        lam = _estimate_lam_max(a_l, inv_diag)
        levels.append(StructuredLevel(
            a=dia,
            inv_diag=jnp.asarray(inv_diag, dtype=dtype),
            inv_l1=jnp.asarray(inv_l1, dtype=dtype),
            lam_max=jnp.asarray(lam, dtype=dtype),
            shape=shape,
        ))
    coarse_inv = _dense_inverse(a_mats[-1])
    device = StructuredHierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
        params=params.solve_view(),
    )
    stats.t_setup = time.perf_counter() - t0
    return StructuredSetupResult(device, stats, params,
                                 a_mats_eager=a_mats, p_mats_eager=p_mats)


def setup_structured(a: CSR, grid_shape, params: AMGParams | None = None,
                     device_setup: bool | None = None, stencil=None,
                     a_slots=None, **kw) -> StructuredSetupResult:
    """Build the all-banded hierarchy for a matrix on `grid_shape`.

    device_setup: run the θ-sensitive setup on the accelerator
    (amg/boxmg_device.py) — the only upload is the fine stencil, and a
    θ-sweep reuses one compiled setup per shape. Defaults to True on
    TPU backends, False elsewhere (the host path is the testing oracle).

    stencil: precomputed fine stencil (numpy or DEVICE array) — sweep
    harnesses pass the device-resident stencil so a θ-sweep uploads the
    operator exactly once.
    """
    if params is None:
        params = AMGParams(**kw)
    dtype = params.dtype or a.data.dtype
    n_nodes = int(np.prod(grid_shape))
    if a.nrows != n_nodes:
        # vector operator (tc3 elasticity): nb interleaved components per
        # node — unknown-based block path (amg/boxmg_block.py); `stencil`
        # here is the (27, nb, nb, …) BLOCK stencil
        assert a.nrows % n_nodes == 0, (grid_shape, a.nrows)
        from .boxmg_block import setup_structured_block

        return setup_structured_block(a, grid_shape, params, dtype,
                                      nb=a.nrows // n_nodes,
                                      device_setup=device_setup,
                                      stencil=stencil)

    if params.structured_interp in ("boxmg", "operator"):
        if stencil is not None:
            if device_setup is None:
                device_setup = (isinstance(stencil, jax.Array)
                                or jax.default_backend() in ("tpu", "axon"))
            if device_setup:
                if a_slots is None:
                    a_slots = tuple(
                        k for k in range(27)
                        if (np.any(stencil[k])
                            if isinstance(stencil, np.ndarray) else True))
                s_dev = jnp.asarray(stencil, dtype=dtype)
                return _setup_operator_device(s_dev, grid_shape, params,
                                              dtype, a_slots)
            s0 = np.asarray(stencil).astype(dtype, copy=False)
            return _setup_operator(a, s0, grid_shape, params, dtype)
        s0 = csr_to_stencil(a, grid_shape)
        if s0 is not None:
            # the whole stencil setup (weights, RAP, diag stats) runs in
            # the hierarchy dtype — f32 halves host traffic and the coarse
            # operators only serve the preconditioner
            if s0.dtype != np.dtype(dtype):
                s0 = s0.astype(dtype)
            if device_setup is None:
                device_setup = jax.default_backend() in ("tpu", "axon")
            if device_setup:
                a_slots = tuple(k for k in range(27) if np.any(s0[k]))
                return _setup_operator_device(jnp.asarray(s0), grid_shape,
                                              params, dtype, a_slots)
            return _setup_operator(a, s0, grid_shape, params, dtype)
        # wider than 3³ (degree-2 FEM): p-coarsen the 5³ fine level onto
        # the vertex grid, θ-sensitive operator path below (amg/wide.py)
        from .wide import csr_to_stencil_wide

        s5 = csr_to_stencil_wide(a, grid_shape)
        if s5 is not None:
            if s5.dtype != np.dtype(dtype):
                s5 = s5.astype(dtype)
            try:
                return _setup_operator_wide(a, s5, grid_shape, params,
                                            dtype)
            except ValueError:
                pass          # non-cell-local corner case → trilinear
        # wider than 5³ (degree ≥ 3 FEM) — θ-blind geometric fallback
    return _setup_trilinear(a, grid_shape, params, dtype)
