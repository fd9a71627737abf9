"""Data-generation sweep harness → reference-schema stats CSVs (all apps).

Functional analog of the reference's L2–L4 stack (four C++ testcase
binaries + 00_data-generation.py): for each configuration, assemble the
FEM system once per cycle, then sweep θ × max_row_sum × symmetric_operator
running `amg_solve` per combination (the reference re-initializes
BoomerAMG per combination, testcase2 main.cpp:443-466), appending one CSV
row per solve in the app's exact schema:

  tc2  (main.cpp:404-416):  setting,dim,ndof,mesh_ref,degree,sol_id,
       sol_pattern_size,epsv,mode,timestamp,θ-sweep-or-view columns
  tc1  (main.cpp:450-459):  setting,dim,ndof,mesh_ref,degree,sol_id,freq,
       mesh,renumbering,seed,maxdiff,num_bas_ref,timestamp,…(+naggr)
  tc3  (main.cpp:421-432):  setting,dim,ndof,mesh_ref,degree,seed,mode,
       pattern_size,max_young,sharp,renumbering,timestamp,…
       (+aggressive_lvls)
  tc2.1 (main.cpp:278-380): timestamp-first rows; three solver modes —
       0 = extremal eigenvalues, 1 = θ sweep 0.05..0.95/0.0125, 2 = view.

Vector-valued fields are quoted comma-joined strings (myutils.h:69-83);
floats use %.17e like the C++ `setprecision(17)` stream. Times are µs.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ..amg.hierarchy import AMGParams
from ..solvers.amg_solver import amg_solve
from ..view.pooling import make_view

APP_TC1 = "testcase1-diffusion-unstructured"
APP_TC2 = "testcase2-diffusion-structured"
APP_TC21 = "testcase2.1-diffusion-singlecell"
APP_TC3 = "testcase3-linear-elasticity"


def _qjoin(v, fmt="{:.17e}"):
    """Quoted comma-join (itertools::print parity)."""
    return '"' + ",".join(
        fmt.format(x) if isinstance(x, float) else str(x) for x in v) + '"'


def _f(x):
    return f"{x:.17e}"


@dataclasses.dataclass
class SweepConfig:
    """One run configuration (the reference's per-run settings JSON)."""

    app: str = APP_TC2
    problem: dict = dataclasses.field(default_factory=dict)
    tol: float = 1e-8
    strong_threshold: tuple = (0.05, 0.96, 0.05)
    max_row_sum: tuple = (0.9, 0.9, 0.05)
    symmetric_operator: tuple = (1, 1)
    aggressive_levels: int = 0          # tc3 uses 2 (main.cpp:454-464)
    make_view: bool = False
    view_size: int = 75
    output_setup_details: bool = False
    cycles: int = 1
    setting_name: str = "config"
    smoother: str = "l1jacobi"
    rtol_mode: bool = False  # True: treat tol as relative (TPU f32 runs)
    solver_mode: int = 1     # tc2.1 only: 0 eigen / 1 sweep / 2 view
    # tc2 degree-1: sweep through the structured (all-DIA, θ-sensitive
    # operator-interp) fast path in f32 — the TPU production solver. One
    # stencil upload + one compiled setup/solve per grid shape serves the
    # whole θ sweep, which is what makes reference-scale (≥10⁶ DoF)
    # dataset generation viable on a single chip.
    structured: bool = False

    @staticmethod
    def from_json(path: str) -> "SweepConfig":
        """Load a flat-JSON settings file (the reference apps run
        `./exe settings.json`, parsed by deal.II ParameterHandler)."""
        import json

        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(SweepConfig)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in raw.items() if k in fields}
        kw["problem"] = dict(raw.get("problem", {}))
        return SweepConfig(**kw)


# ---------------------------------------------------------------------------
# per-app adapters: build problem + CSV prefix for a given cycle
# ---------------------------------------------------------------------------
def _build_tc2(cfg, cycle):
    from ..fem.structured import StructuredDiffusion

    kw = dict(cfg.problem)
    base_ref = kw.pop("refinements", 2)
    p = StructuredDiffusion(refinements=base_ref + cycle, **kw)
    a, b, x0 = p.build()
    prefix = ",".join([
        cfg.setting_name, "3", str(p.ndof), str(base_ref + cycle),
        str(p.degree), str(p.sol_id), str(p.pattern_size),
        _qjoin(list(map(float, p.epsv))), str(p.mode),
        str(int(time.time())),
    ])
    if p.degree == 1:
        n = p.n_nodes_1d
        return a, b, x0, prefix, (n, n, n)
    return a, b, x0, prefix, None


def _build_tc1(cfg, cycle):
    from ..fem.unstructured import UnstructuredDiffusion

    kw = dict(cfg.problem)
    base_ref = kw.pop("refinements", 1)
    num_bas_ref = kw.pop("num_bas_ref", 0)
    p = UnstructuredDiffusion(refinements=base_ref + cycle, **kw)
    a, b, x0 = p.build()
    prefix = ",".join([
        cfg.setting_name, "3", str(p.ndof), str(base_ref + cycle),
        str(p.degree), str(p.sol_id), _f(float(p.freq)), p.mesh,
        p.renumbering, str(p.seed), _f(float(p.max_diffusion)),
        str(num_bas_ref), str(int(time.time())),
    ])
    return a, b, x0, prefix, None


def _build_tc3(cfg, cycle):
    from ..fem.elasticity import LinearElasticity

    kw = dict(cfg.problem)
    base_ref = kw.pop("refinements", 1)
    p = LinearElasticity(refinements=base_ref + cycle, **kw)
    a, b, x0 = p.build()
    prefix = ",".join([
        cfg.setting_name, "3", str(p.ndof), str(base_ref + cycle),
        str(p.degree), str(p.seed), str(p.mode), str(p.pattern_size),
        _f(float(p.max_young)), str(int(p.sharp)), "0",
        str(int(time.time())),
    ])
    if p.degree == 1:
        # vector Q1: a 27-point stencil of 3×3 blocks — θ-sweeps ride the
        # unknown-based block structured path (amg/boxmg_block.py); the
        # grid shape is the NODE grid (amg_solve infers nb from nrows)
        n = p.n_nodes_1d
        return a, b, x0, prefix, (n, n, n)
    return a, b, x0, prefix, None


def _build_tc21(cfg, cycle):
    from ..fem.singlecell import SingleCellDiffusion

    kw = dict(cfg.problem)
    base_ref = kw.pop("num_ref", 3)
    p = SingleCellDiffusion(num_ref=base_ref + cycle, **kw)
    a, b, x0 = p.build()
    # tc2.1 rows are timestamp-FIRST (main.cpp:307-380)
    prefix = ",".join([
        str(int(time.time())), cfg.setting_name, "3", str(p.ndof),
        str(base_ref + cycle), str(p.degree), "0",
        _f(float(p.diffusion_exp)),
        _qjoin(list(map(float, p.marked_point))),
    ])
    if p.degree == 1:
        # degree-1 Q1 on the uniform cube: the operator is a 27-point
        # lattice stencil, so θ-sweeps (solver_mode 1) can ride the
        # structured fast path exactly like tc2 (main.cpp:334-338 rows)
        n = p.n_nodes_1d
        return a, b, x0, prefix, (n, n, n)
    return a, b, x0, prefix, None


_BUILDERS = {APP_TC1: _build_tc1, APP_TC2: _build_tc2,
             APP_TC21: _build_tc21, APP_TC3: _build_tc3}

_PREFIX_HEADERS = {
    APP_TC1: ("setting,dim,ndof,mesh_ref,degree,sol_id,freq,mesh,"
              "renumbering,seed,maxdiff,num_bas_ref,timestamp,"),
    APP_TC2: ("setting,dim,ndof,mesh_ref,degree,sol_id,sol_pattern_size,"
              "epsv,mode,timestamp,"),
    APP_TC21: ("timestamp,setting,dim,ndof,mesh_ref,degree,renumbering,"
               "diff,mpt,"),
    APP_TC3: ("setting,dim,ndof,mesh_ref,degree,seed,mode,pattern_size,"
              "max_young,sharp,renumbering,timestamp,"),
}
# apps whose sweep rows carry the aggressive-coarsening column
_NAGGR_COLUMN = {APP_TC1: "naggr,", APP_TC3: "aggressive_lvls,",
                 APP_TC21: "agg_lvls,", APP_TC2: ""}

SWEEP_DETAILS = "nrows,nze,sparsity,grid,operator,memory,"
VIEW_TAIL = "t_view,view_size,view,view_count,view_max_pp,view_max_np\n"
EIGEN_TAIL = "toll,solver,min,max,amin,amax\n"


def _sweep_header(cfg: SweepConfig) -> str:
    if cfg.app == APP_TC21:
        # tc2.1's abbreviated column names (main.cpp:334-338)
        return (_PREFIX_HEADERS[cfg.app]
                + "theta,mrs,sym,agg_lvls,tol,t_setup,"
                + ("nrows,nze,spa,grid,op,mem," if cfg.output_setup_details
                   else "")
                + "t_solve,it,res\n")
    return (_PREFIX_HEADERS[cfg.app]
            + "theta,maxrowsum,symop," + _NAGGR_COLUMN[cfg.app] + "tol,"
            + "t_amg_setup,"
            + (SWEEP_DETAILS if cfg.output_setup_details else "")
            + "t_solve,niters,p_res\n")


def _sweep_values(triple):
    start, stop, step = triple
    if step == 0:
        return [start]
    out = []
    t = start
    # C++ `for (t = a; t <= b; t += c)` semantics incl. fp accumulation
    while t <= stop + 1e-12:
        out.append(round(t, 12))
        t += step
    return out


def run_config(cfg: SweepConfig, out_path: str) -> str:
    """Execute one configuration, appending rows to out_path (created with
    the app's header if absent). Returns the path."""
    new = not os.path.exists(out_path)
    builder = _BUILDERS[cfg.app]
    with open(out_path, "a") as fh:
        if new:
            if cfg.app == APP_TC21 and cfg.solver_mode == 0:
                fh.write(_PREFIX_HEADERS[cfg.app] + EIGEN_TAIL)
            elif cfg.make_view or (cfg.app == APP_TC21
                                   and cfg.solver_mode == 2):
                fh.write(_PREFIX_HEADERS[cfg.app] + VIEW_TAIL)
            else:
                fh.write(_sweep_header(cfg))
        for cycle in range(cfg.cycles):
            a, b, x0, prefix, grid_shape = builder(cfg, cycle)
            if cfg.app == APP_TC21 and cfg.solver_mode == 0:
                _write_eigen_rows(fh, prefix, a, cfg)
            elif cfg.make_view or (cfg.app == APP_TC21
                                   and cfg.solver_mode == 2):
                _write_view_row(fh, prefix, a, cfg.view_size)
            elif cfg.structured and grid_shape is not None:
                _write_structured_sweep_rows(fh, prefix, a, b, x0, cfg,
                                             grid_shape)
            else:
                _write_sweep_rows(fh, prefix, a, b, x0, cfg)
    # classical sweeps compile a distinct-shape solve per (problem, θ);
    # long runs would otherwise exhaust process memory maps (observed:
    # LLVM "Unable to allocate section memory" at vm.max_map_count).
    # STRUCTURED sweeps are compile-stable by design (one executable per
    # grid shape serves every θ/seed) — keep their caches hot.
    if not cfg.structured:
        import jax

        jax.clear_caches()
    return out_path


def _write_view_row(fh, prefix, a, view_size):
    view, t_us = make_view(a, view_size)
    fh.write(prefix + f",{int(t_us)},{view_size},")
    fh.write(_qjoin(view.sum.ravel().tolist()) + ",")
    fh.write(_qjoin(view.count.ravel().tolist(), fmt="{}") + ",")
    fh.write(_qjoin(view.max_pp.ravel().tolist()) + ",")
    fh.write(_qjoin(view.max_np.ravel().tolist()) + "\n")


def _write_eigen_rows(fh, prefix, a, cfg: SweepConfig):
    """tc2.1 mode-0 parity: per 'solver', the four extremal requests
    (SMALLEST_REAL, LARGEST_REAL, SMALLEST_MAGNITUDE ×2 — the reference
    literally queries smallest-magnitude twice, main.cpp:319-321; we report
    |λ|min and |λ|max as the honest amin/amax)."""
    from ..solvers.eigen import dense_extremal, lanczos_extremal

    solvers = [lambda: lanczos_extremal(a, m=min(100, a.nrows)),
               lambda: lanczos_extremal(a, m=min(200, a.nrows))]
    if a.nrows <= 2048:
        solvers.append(lambda: dense_extremal(a))
    for i, sv in enumerate(solvers):
        eig = sv()
        fh.write(prefix + "," + ",".join([
            _f(cfg.tol), str(i), _f(eig.lam_min), _f(eig.lam_max),
            _f(eig.lam_abs_min), _f(eig.lam_abs_max)]) + "\n")


def _write_sweep_rows(fh, prefix, a, b, x0, cfg: SweepConfig):
    naggr = cfg.aggressive_levels
    import jax as _jax

    # accelerator classical sweeps: f32 hierarchy (emulated f64 would
    # dominate) + WELL device format (the gather-free unstructured
    # kernel); requires the relative-tolerance mode the structured TPU
    # datasets already use (tnl is tolerance-level agnostic)
    on_acc = _jax.default_backend() in ("tpu", "axon")
    dtype = np.float32 if (on_acc and cfg.rtol_mode) else None
    for theta in _sweep_values(cfg.strong_threshold):
        for mrs in _sweep_values(cfg.max_row_sum):
            for sym in range(int(cfg.symmetric_operator[0]),
                             int(cfg.symmetric_operator[1]) + 1):
                params = AMGParams(
                    symmetric_operator=bool(sym), strong_threshold=theta,
                    max_row_sum=mrs,
                    aggressive_coarsening_num_levels=naggr,
                    output_details=cfg.output_setup_details,
                    smoother=cfg.smoother, dtype=dtype,
                    # bucket device shapes so the θ sweep reuses jitted
                    # solves instead of recompiling per hierarchy shape
                    shape_buckets=True)
                tol_kw = ({"rtol": cfg.tol, "tol": 0.0} if cfg.rtol_mode
                          else {"tol": cfg.tol})
                res = amg_solve(a, b, params, x0=x0, **tol_kw)
                fields = [prefix, _f(theta), _f(mrs), str(sym)]
                if _NAGGR_COLUMN[cfg.app]:
                    fields.append(str(naggr))
                fields += [_f(cfg.tol), _f(res.t_amg_setup)]
                if cfg.output_setup_details:
                    fields += res.hierarchy.stats.as_csv_fields()
                fields += [_f(res.t_solve), str(res.niters),
                           _qjoin(list(map(float, res.p_res)))]
                fh.write(",".join(fields) + "\n")


def _write_structured_sweep_rows(fh, prefix, a, b, x0, cfg: SweepConfig,
                                 grid_shape):
    """θ-sweep through the structured fast path (SweepConfig.structured).

    f32 solve to a RELATIVE tolerance (cfg.tol is interpreted relatively;
    f32 PCG reaches ~1e-6 — pass tol=1e-6 for TPU-generated datasets; the
    per-problem-normalized training target tnl is tolerance-level
    agnostic). The fine stencil is built/uploaded ONCE; every θ re-runs
    the same compiled setup+solve executables, so reference-scale grids
    sweep in device time, not compile/transfer time."""
    import jax.numpy as jnp

    from ..amg.boxmg import csr_to_stencil
    from ..amg.structured_mg import setup_structured

    is_block = a.nrows != int(np.prod(grid_shape))
    if is_block:
        # vector operator (tc3): unknown-based block path — the block
        # stencil is built/uploaded ONCE; every θ re-runs one compiled
        # device setup + solve (boxmg_block.setup_structured_block_device)
        from ..amg.boxmg_block import csr_to_block_stencil

        nb = a.nrows // int(np.prod(grid_shape))
        sb = csr_to_block_stencil(a, grid_shape, nb)
        assert sb is not None, "block structured sweep needs degree 1"
        sb = sb.astype(np.float32)
        a_slots = None
        import jax as _jax

        if _jax.default_backend() in ("tpu", "axon"):
            stencil = jnp.asarray(sb)
            # CANONICAL full slot set — slots is a static argument of the
            # one-jit block setup chain; deriving it from the problem's
            # incidental numeric zeros makes it seed-dependent and forces
            # a fresh ~700 s chain compile per problem (measured, r4:
            # 5 distinct tuples in 12 ref-3 problems). The full 243-slot
            # chain costs ~25% more device time per setup (~0.05 s) and
            # compiles ONCE per (shape, schedule) for the whole dataset.
            a_slots = tuple((k, ci, cj) for k in range(27)
                            for ci in range(nb) for cj in range(nb))
        else:
            stencil = sb
    else:
        s0 = csr_to_stencil(a, grid_shape)
        assert s0 is not None, "structured sweep needs a ≤27-point operator"
        s0 = s0.astype(np.float32)
        a_slots = tuple(k for k in range(27) if np.any(s0[k]))
        import jax as _jax

        on_dev = _jax.default_backend() in ("tpu", "axon")
        stencil = jnp.asarray(s0) if on_dev else s0
    naggr = cfg.aggressive_levels
    for theta in _sweep_values(cfg.strong_threshold):
        for mrs in _sweep_values(cfg.max_row_sum):
            for sym in range(int(cfg.symmetric_operator[0]),
                             int(cfg.symmetric_operator[1]) + 1):
                params = AMGParams(
                    symmetric_operator=bool(sym), strong_threshold=theta,
                    max_row_sum=mrs,
                    aggressive_coarsening_num_levels=naggr,
                    smoother=cfg.smoother, dtype=np.float32)
                if is_block:
                    from ..amg.boxmg_block import setup_structured_block

                    blk = lambda: setup_structured_block(
                        a, grid_shape, params, np.float32, nb=nb,
                        stencil=stencil,
                        **({"slots": a_slots,
                            "device_setup": True} if a_slots else {}))
                    blk()                      # warm (absorbs compiles)
                    h = blk()
                    h2 = blk()
                    if h2.stats.t_setup < h.stats.t_setup:
                        h = h2
                else:
                    # warm-up once (absorbs one-off executable compiles,
                    # which production never pays per θ), then time the
                    # WARM calls; min-of-N suppresses tunnel jitter
                    setup_structured(a, grid_shape, params,
                                     stencil=stencil, a_slots=a_slots)
                    h = setup_structured(a, grid_shape, params,
                                         stencil=stencil, a_slots=a_slots)
                    h2 = setup_structured(a, grid_shape, params,
                                          stencil=stencil, a_slots=a_slots)
                    if h2.stats.t_setup < h.stats.t_setup:
                        h = h2
                res = amg_solve(a, b, params, x0=x0, hierarchy=h,
                                rtol=cfg.tol, tol=0.0)
                for _ in range(2):
                    r2 = amg_solve(a, b, params, x0=x0, hierarchy=h,
                                   rtol=cfg.tol, tol=0.0)
                    if r2.t_solve < res.t_solve:
                        res = r2
                fields = [prefix, _f(theta), _f(mrs), str(sym)]
                if _NAGGR_COLUMN[cfg.app]:
                    fields.append(str(naggr))
                fields += [_f(cfg.tol), _f(h.stats.t_setup * 1e6)]
                if cfg.output_setup_details:
                    fields += h.stats.as_csv_fields()
                fields += [_f(res.t_solve), str(res.niters),
                           _qjoin(list(map(float, res.p_res)))]
                fh.write(",".join(fields) + "\n")


def generate_dataset(configs, out_dir: str, pooling_size: int | None = None,
                     progress=None) -> str:
    """Run many configurations (00_data-generation.py analog).

    pooling_size not None → pooling mode: every config is overridden to
    make_view with that view size (00_data-generation.py:91-95). Rows are
    concatenated into one stats.csv under out_dir/times or out_dir/poolingN.
    """
    sub = f"pooling{pooling_size}" if pooling_size is not None else "times"
    path = os.path.join(out_dir, sub)
    os.makedirs(path, exist_ok=True)
    out_csv = os.path.join(path, "stats.csv")
    if os.path.exists(out_csv):
        os.remove(out_csv)
    for i, cfg in enumerate(configs):
        if pooling_size is not None:
            cfg = dataclasses.replace(cfg, make_view=True,
                                      view_size=pooling_size,
                                      strong_threshold=(0.0, 0.0, 0.0))
        run_config(cfg, out_csv)
        if progress:
            progress(i + 1, len(configs))
    return out_csv
