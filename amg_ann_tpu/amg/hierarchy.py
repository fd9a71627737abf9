"""AMG hierarchy setup: strength → PMIS → interpolation → Galerkin RAP.

This is the native replacement for everything the reference obtains from
`PreconditionBoomerAMG::initialize` (reference: common/amg_solver.h:47-51,
timed there as t_amg_setup) plus the per-level statistics its parser
scrapes out of hypre's text dump (reference: common/parser.h:181-266 —
rows/nnz/sparsity per level, grid/operator/memory complexity).

Setup runs on host (data-dependent shapes); the returned hierarchy carries
static-shape ELL device pytrees consumed by the jitted solve phase.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..sparse import ell as ell_mod
from ..sparse.csr import CSR
from ..sparse.spgemm import spgemm
from .coarsen import aggressive_pass, pmis
from .interp import direct_interpolation
from .strength import classical_strength


# ---------------------------------------------------------------------------
# Parameters — field-for-field analog of BoomerAMGData =
# PreconditionBoomerAMG::AdditionalData (reference: testcase2 main.cpp:447-453)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class AMGParams:
    symmetric_operator: bool = True
    strong_threshold: float = 0.25
    max_row_sum: float = 0.9
    aggressive_coarsening_num_levels: int = 0
    output_details: bool = False
    # native knobs (no hypre equivalent exposed by the reference)
    max_levels: int = 25
    max_coarse_size: int = 64
    trunc_factor: float = 0.0
    p_max_elements: int = 4
    smoother: str = "l1jacobi"  # "jacobi" | "l1jacobi" | "chebyshev"
    # round device-array shapes up to ~12.5%-granular buckets so θ-sweeps
    # over one problem family reuse jitted solve executables instead of
    # recompiling per hierarchy shape (sweep harness turns this on)
    shape_buckets: bool = False
    # classical coarse levels at or below this row count store their
    # operators DENSELY — XLA's TPU gather runs the ELL SpMV ~600× below
    # HBM speed of light, while a ≤2048² matmul is one MXU op
    dense_coarse_threshold: int = 2048
    # structured-path interpolation: "boxmg" (default) = θ-filtered BoxMG
    # collapsed weights (level-independent convergence; amg/boxmg.py
    # interp_weights_boxmg), "operator" = θ-filtered Ruge–Stüben direct
    # weights (the round-2 baseline), "trilinear" = fixed geometric weights
    structured_interp: str = "boxmg"
    # classical-path device operator format: "well" = windowed ELL with
    # the gather-free Pallas SpMV + bandwidth-reducing RCM reorder
    # (sparse/well.py — the TPU path for UNSTRUCTURED matrices), "ell" =
    # plain padded ELL (XLA gather; CPU parity path), "auto" = well on
    # TPU backends, ell elsewhere
    device_format: str = "auto"
    cycle_type: str = "V"       # "V" | "W" (γ=2 coarse recursions)
    n_pre_smooth: int = 1
    n_post_smooth: int = 1
    cheb_degree: int = 2
    seed: int = 0
    dtype: Optional[np.dtype] = None

    _SMOOTHERS = ("jacobi", "l1jacobi", "chebyshev")

    def solve_view(self) -> "AMGParams":
        """The SOLVE-relevant subset, with every setup-only field pinned
        to a canonical value.

        The device hierarchy carries its params as a jit-STATIC member;
        storing the full params there would recompile the (θ-independent)
        solve executable for every θ of a sweep. Only the fields the
        V-cycle/smoother actually read survive canonicalization."""
        return dataclasses.replace(
            self, strong_threshold=0.0, max_row_sum=1.0,
            aggressive_coarsening_num_levels=0, output_details=False,
            max_levels=0, max_coarse_size=0, trunc_factor=0.0,
            p_max_elements=0, shape_buckets=False, seed=0,
            symmetric_operator=True, structured_interp="operator",
            dense_coarse_threshold=0, device_format="auto")

    def __post_init__(self):
        if self.smoother not in self._SMOOTHERS:
            raise ValueError(
                f"unknown smoother {self.smoother!r}; one of {self._SMOOTHERS}"
            )
        if not (0.0 <= self.strong_threshold <= 1.0):
            raise ValueError(
                f"strong_threshold must be in [0, 1], got {self.strong_threshold}"
            )
        if self.cycle_type not in ("V", "W"):
            raise ValueError(f"cycle_type must be V or W, got {self.cycle_type!r}")
        if self.structured_interp not in ("boxmg", "operator", "trilinear"):
            raise ValueError(
                f"structured_interp must be 'boxmg', 'operator' or "
                f"'trilinear', got {self.structured_interp!r}")
        if self.device_format not in ("auto", "ell", "well"):
            raise ValueError(
                f"device_format must be 'auto', 'ell' or 'well', "
                f"got {self.device_format!r}")


@struct.dataclass
class DeviceLevel:
    """One level of the device hierarchy (static-shape pytree)."""

    a: ell_mod.ELL
    p: Optional[ell_mod.ELL]  # None on the coarsest level
    r: Optional[ell_mod.ELL]
    inv_diag: jax.Array      # 1/diag(A)
    inv_l1: jax.Array        # 1/Σ_j|a_ij|
    lam_max: jax.Array       # Chebyshev upper bound for D⁻¹A (scalar)


@struct.dataclass
class DeviceHierarchy:
    levels: tuple            # tuple[DeviceLevel]
    coarse_inv: jax.Array    # dense inverse of the coarsest operator
    params: AMGParams = struct.field(pytree_node=False)
    # level-0 bandwidth-reducing permutation (WELL format): the device
    # hierarchy solves in permuted variables; _jit_solve applies
    # b[perm] on entry and x[iperm] on exit. None = identity.
    perm: Optional[jax.Array] = None     # (n_dev,) int32
    iperm: Optional[jax.Array] = None


@dataclasses.dataclass
class HierarchyStats:
    """What hypre's 'output_details' dump reports, as first-class values."""

    n_levels: int
    rows: list            # per-level n
    nnz: list             # per-level nnz(A_l)
    sparsity: list        # per-level nnz/n (avg entries per row)
    grid_complexity: float      # Σ n_l / n_0
    operator_complexity: float  # Σ nnz(A_l) / nnz(A_0)
    memory_complexity: float    # (Σ nnz(A_l) + Σ nnz(P_l)) / nnz(A_0)
    t_setup: float = 0.0        # seconds, wall

    def as_csv_fields(self):
        """The 6 quoted fields of the reference CSV schema
        (nrows, nze, sparsity, grid, operator, memory)."""
        q = lambda v: '"' + ",".join(str(x) for x in v) + '"'
        return [
            q(self.rows), q(self.nnz),
            q([f"{s:.3f}" for s in self.sparsity]),
            f"{self.grid_complexity:.6f}",
            f"{self.operator_complexity:.6f}",
            f"{self.memory_complexity:.6f}",
        ]


@dataclasses.dataclass
class Hierarchy:
    """Host-side hierarchy + device pytree + stats."""

    a_mats: list           # list[CSR] per level
    p_mats: list           # list[CSR] between levels (len = n_levels-1)
    device: DeviceHierarchy
    stats: HierarchyStats
    params: AMGParams


def _estimate_lam_max(a: CSR, inv_diag: np.ndarray, iters: int = 12,
                      seed: int = 7, big_nnz: int = 2_000_000) -> float:
    """Upper estimate of λ_max(D⁻¹A) for Chebyshev/damped-Jacobi intervals.

    Hybrid: the Gershgorin bound max_i Σ_j|a_ij|/|a_ii| for large levels —
    tight on fine stencil operators (Poisson: 2.0 vs true 1.97) and O(nnz),
    avoiding power-iteration matvecs that dominated setup time; power
    iteration for small (coarse Galerkin) levels, where Gershgorin is loose
    (observed 1.8× over) and matvecs are cheap."""
    if a.nrows == 0:
        return 1.0
    if a.nnz > big_nnz:
        rows, _, vals = a.row_expand()
        l1 = np.bincount(rows, weights=np.abs(vals), minlength=a.nrows)
        bound = float(np.max(l1 * np.abs(inv_diag)))
        return bound if bound > 0 else 1.0
    rng = np.random.default_rng(seed)
    x = rng.random(a.nrows) - 0.5
    x /= np.linalg.norm(x) + 1e-300
    lam = 1.0
    for _ in range(iters):
        y = inv_diag * a.matvec(x)
        lam = float(np.linalg.norm(y))
        if lam == 0.0:
            return 1.0
        x = y / lam
    return 1.1 * lam  # safety margin


def setup(a: CSR, params: AMGParams | None = None, host_only: bool = False,
          **kw) -> Hierarchy:
    """Build the full AMG hierarchy for matrix `a`.

    host_only=True skips the device pytree (hierarchy-statistics sweeps —
    the reference's BoomerAMG 'output_details' dump, parser.h:240-256 —
    need only the host CSR levels)."""
    if params is None:
        params = AMGParams(**kw)
    t0 = time.perf_counter()
    dtype = params.dtype or a.data.dtype

    a_mats = [a.astype(dtype)]
    p_mats = []
    level = 0
    while (a_mats[-1].nrows > params.max_coarse_size
           and level < params.max_levels - 1):
        a_l = a_mats[-1]
        s = classical_strength(a_l, params.strong_threshold,
                               params.max_row_sum)
        cf = pmis(s, seed=params.seed + level)
        if level < params.aggressive_coarsening_num_levels:
            cf = aggressive_pass(s, cf, seed=params.seed + level)
        nc = int(cf.sum())
        if nc == 0 or nc == a_l.nrows:
            break  # coarsening stalled
        p = direct_interpolation(a_l, s, cf,
                                 trunc_factor=params.trunc_factor,
                                 max_per_row=params.p_max_elements)
        r = p.transpose()
        ap = spgemm(a_l, p)
        a_c = spgemm(r, ap)
        p_mats.append(p)
        a_mats.append(a_c)
        level += 1

    stats = _make_stats(a_mats, p_mats)
    device = (None if host_only
              else _to_device(a_mats, p_mats, params, dtype))
    stats.t_setup = time.perf_counter() - t0
    return Hierarchy(a_mats, p_mats, device, stats, params)


def _make_stats(a_mats, p_mats) -> HierarchyStats:
    rows = [m.nrows for m in a_mats]
    nnz = [m.nnz for m in a_mats]
    sparsity = [m.sparsity for m in a_mats]
    return HierarchyStats(
        n_levels=len(a_mats),
        rows=rows,
        nnz=nnz,
        sparsity=sparsity,
        grid_complexity=sum(rows) / max(rows[0], 1),
        operator_complexity=sum(nnz) / max(nnz[0], 1),
        memory_complexity=(sum(nnz) + sum(p.nnz for p in p_mats))
        / max(nnz[0], 1),
    )


def row_granule(n: int) -> int:
    """Bucket granule ≈ n/4 rounded to a power of two (min 64): shapes
    within the same quarter-octave interval share a padded size, so small
    per-θ variations of coarse-level sizes mostly reuse jitted solves."""
    if n <= 64:
        return 64
    return max(64, 2 ** (max(int(np.floor(np.log2(n))) - 2, 6)))


def _pad1(v, n_pad):
    out = np.zeros(n_pad, dtype=v.dtype)
    out[: v.size] = v
    return out


def _resolve_format(params: AMGParams) -> str:
    if params.device_format != "auto":
        return params.device_format
    try:
        return ("well" if jax.default_backend() in ("tpu", "axon")
                else "ell")
    except Exception:  # pragma: no cover
        return "ell"


def _to_device_well(a_mats, p_mats, params: AMGParams,
                    dtype) -> DeviceHierarchy:
    """WELL-format device hierarchy: every non-dense level stores A (and
    its transfers) as windowed ELL in a bandwidth-reduced ordering —
    the gather-free unstructured TPU path (sparse/well.py)."""
    from ..sparse import well as well_mod

    L = len(a_mats)
    thresh = params.dense_coarse_threshold
    dense_flags = [0 < a.nrows <= thresh and l > 0
                   for l, a in enumerate(a_mats)]
    # level-0 ordering: RCM iff it beats the natural order; deeper WELL
    # levels take the ordering INDUCED through P (coarse points sorted by
    # their first fine connection) so P/R/A_c all inherit the level-0
    # band — independent per-level RCM leaves the transfers windowless
    perms, a_perm = [], []
    for l, a_l in enumerate(a_mats):
        if dense_flags[l]:
            p = None
        elif l == 0:
            p = well_mod.best_perm(a_l)
        else:
            p = well_mod.induced_coarse_perm(p_mats[l - 1], perms[l - 1])
        perms.append(p)
        a_perm.append(well_mod.permute_sym(a_l, p) if p is not None
                      else a_l)

    def vec_len(l):
        return -(-max(a_mats[l].nrows, 1) // well_mod.BLOCK) \
            * well_mod.BLOCK

    def _pad_dense(m, rp, cp):
        out = np.zeros((rp, cp), dtype=dtype)
        out[: m.shape[0], : m.shape[1]] = m
        return jnp.asarray(out)

    levels = []
    for l, a_l in enumerate(a_perm):
        diag = a_l.diagonal()
        inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag),
                            0.0)
        rows, _, vals = a_l.row_expand()
        l1 = np.zeros(a_l.nrows)
        np.add.at(l1, rows, np.abs(vals))
        inv_l1 = np.where(l1 != 0, 1.0 / np.where(l1 == 0, 1, l1), 0.0)
        lam = _estimate_lam_max(a_l, inv_diag)
        has_next = l < L - 1
        n_pad = vec_len(l)
        if dense_flags[l]:
            n_next = a_mats[l + 1].nrows if has_next else 0
            a_op = ell_mod.DenseOp(
                m=_pad_dense(a_l.to_dense(), n_pad, n_pad),
                nrows=a_l.nrows, ncols=a_l.nrows)
            p_op = (ell_mod.DenseOp(
                m=_pad_dense(p_mats[l].to_dense(), n_pad, vec_len(l + 1)),
                nrows=p_mats[l].nrows, ncols=n_next) if has_next else None)
            r_op = (ell_mod.DenseOp(
                m=_pad_dense(p_mats[l].to_dense().T, vec_len(l + 1), n_pad),
                nrows=n_next, ncols=p_mats[l].nrows) if has_next else None)
        else:
            a_op = well_mod.from_csr(a_l, dtype=dtype)
            p_op = r_op = None
            if has_next:
                p_pm = well_mod.permute(p_mats[l], perms[l], perms[l + 1])
                r_pm = well_mod.permute(p_mats[l].transpose(),
                                        perms[l + 1], perms[l])
                p_op = well_mod.from_csr(p_pm, dtype=dtype)
                r_op = well_mod.from_csr(r_pm, dtype=dtype)
        levels.append(DeviceLevel(
            a=a_op, p=p_op, r=r_op,
            inv_diag=jnp.asarray(_pad1(inv_diag, n_pad), dtype=dtype),
            inv_l1=jnp.asarray(_pad1(inv_l1, n_pad), dtype=dtype),
            lam_max=jnp.asarray(lam, dtype=dtype),
        ))

    coarse = a_perm[-1].to_dense().astype(np.float64)
    try:
        coarse_inv = np.linalg.inv(coarse)
    except np.linalg.LinAlgError:
        coarse_inv = np.linalg.pinv(coarse)
    ncp = vec_len(L - 1)
    padded = np.zeros((ncp, ncp))
    padded[: coarse.shape[0], : coarse.shape[0]] = coarse_inv
    perm_dev = iperm_dev = None
    if perms[0] is not None:
        n0, nd0 = a_mats[0].nrows, vec_len(0)
        perm_full = np.concatenate(
            [perms[0], np.arange(n0, nd0)]).astype(np.int32)
        iperm_full = np.empty(nd0, dtype=np.int32)
        iperm_full[perm_full] = np.arange(nd0, dtype=np.int32)
        perm_dev = jnp.asarray(perm_full)
        iperm_dev = jnp.asarray(iperm_full)
    return DeviceHierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(padded.astype(dtype)),
        params=params.solve_view(),
        perm=perm_dev, iperm=iperm_dev,
    )


def _to_device(a_mats, p_mats, params: AMGParams, dtype) -> DeviceHierarchy:
    if _resolve_format(params) == "well":
        return _to_device_well(a_mats, p_mats, params, dtype)
    bucketed = params.shape_buckets
    levels = []
    for l, a_l in enumerate(a_mats):
        diag = a_l.diagonal()
        inv_diag = np.where(diag != 0, 1.0 / np.where(diag == 0, 1, diag), 0.0)
        rows, _, vals = a_l.row_expand()
        l1 = np.zeros(a_l.nrows)
        np.add.at(l1, rows, np.abs(vals))
        inv_l1 = np.where(l1 != 0, 1.0 / np.where(l1 == 0, 1, l1), 0.0)
        lam = _estimate_lam_max(a_l, inv_diag)
        has_next = l < len(a_mats) - 1
        ra = row_granule(a_l.nrows) if bucketed else 1
        ka = 4 if bucketed else 1
        ra_next = (row_granule(a_mats[l + 1].nrows)
                   if (bucketed and has_next) else 1)
        n_pad = -(-a_l.nrows // ra) * ra if bucketed else a_l.nrows

        def _pad_dense(m, rp, cp):
            out = np.zeros((rp, cp), dtype=dtype)
            out[: m.shape[0], : m.shape[1]] = m
            return jnp.asarray(out)

        # coarse levels go DENSE: the ELL gather SpMV is the measured TPU
        # bottleneck of the classical path (~0.11 Gnnz/s); a small matmul
        # rides the MXU instead (sparse/ell.DenseOp)
        dense = 0 < a_l.nrows <= params.dense_coarse_threshold and l > 0
        if has_next:
            n_next = a_mats[l + 1].nrows
            np_next = -(-n_next // ra_next) * ra_next if bucketed else n_next
        if dense:
            a_op = ell_mod.DenseOp(
                m=_pad_dense(a_l.to_dense(), n_pad, n_pad),
                nrows=a_l.nrows, ncols=a_l.nrows)
            p_op = (ell_mod.DenseOp(
                m=_pad_dense(p_mats[l].to_dense(), n_pad, np_next),
                nrows=p_mats[l].nrows, ncols=n_next) if has_next else None)
            r_op = (ell_mod.DenseOp(
                m=_pad_dense(p_mats[l].to_dense().T, np_next, n_pad),
                nrows=n_next, ncols=p_mats[l].nrows) if has_next else None)
        else:
            a_op = ell_mod.from_csr(a_l, dtype=dtype, k_align=ka,
                                    row_align=ra)
            p_op = ell_mod.from_csr(p_mats[l], dtype=dtype, k_align=ka,
                                    row_align=ra) if has_next else None
            r_op = ell_mod.from_csr(p_mats[l].transpose(), dtype=dtype,
                                    k_align=ka, row_align=ra_next) \
                if has_next else None
        levels.append(DeviceLevel(
            a=a_op, p=p_op, r=r_op,
            inv_diag=jnp.asarray(_pad1(inv_diag, n_pad), dtype=dtype),
            inv_l1=jnp.asarray(_pad1(inv_l1, n_pad), dtype=dtype),
            lam_max=jnp.asarray(lam, dtype=dtype),
        ))
    coarse = a_mats[-1].to_dense().astype(np.float64)
    # regularized pseudo-inverse guards against a singular coarsest block
    # (can happen for pure-Neumann subproblems)
    try:
        coarse_inv = np.linalg.inv(coarse)
    except np.linalg.LinAlgError:
        coarse_inv = np.linalg.pinv(coarse)
    if bucketed:
        nc = coarse_inv.shape[0]
        la = levels[-1].a
        ncp = la.m.shape[0] if isinstance(la, ell_mod.DenseOp) \
            else la.data.shape[0]
        padded = np.zeros((ncp, ncp))
        padded[:nc, :nc] = coarse_inv
        coarse_inv = padded
    return DeviceHierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv.astype(dtype)),
        params=params.solve_view(),
    )
