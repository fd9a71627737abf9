"""Data-generation sweep harness → reference-schema stats CSVs.

Functional analog of the reference's L2–L4 stack (per-app C++ binaries +
00_data-generation.py): for each problem configuration, assemble the FEM
system once, then sweep θ × max_row_sum × symmetric_operator, running
`amg_solve` per combination (the reference re-initializes BoomerAMG per
combination, testcase2 main.cpp:443-466) and appending one CSV row per
solve in the exact reference schema (main.cpp:404-416):

  sweep:   setting,dim,ndof,mesh_ref,degree,sol_id,sol_pattern_size,epsv,
           mode,timestamp,theta,maxrowsum,symop,tol,t_amg_setup,
           [nrows,nze,sparsity,grid,operator,memory,]t_solve,niters,p_res
  pooling: ...,timestamp,t_view,view_size,view,view_count,view_max_pp,
           view_max_np

Vector-valued fields are quoted comma-joined strings (myutils.h:69-83);
floats use %.17e like the C++ `setprecision(17)` stream. Times are µs.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ..amg.hierarchy import AMGParams
from ..fem.structured import StructuredDiffusion
from ..solvers.amg_solver import amg_solve
from ..view.pooling import make_view


def _qjoin(v, fmt="{:.17e}"):
    """Quoted comma-join (itertools::print parity)."""
    return '"' + ",".join(
        fmt.format(x) if isinstance(x, float) else str(x) for x in v) + '"'


def _f(x):
    return f"{x:.17e}"


@dataclasses.dataclass
class SweepConfig:
    """One run configuration (the reference's per-run settings JSON)."""

    pattern_size: int = 2
    refinements: int = 2
    degree: int = 1
    mode: int = 3
    epsv: tuple = ()
    tol: float = 1e-8
    # θ sweep triple (start, stop, step) — testcase2 settings.cpp:14-20
    strong_threshold: tuple = (0.05, 0.96, 0.05)
    max_row_sum: tuple = (0.9, 0.9, 0.05)
    symmetric_operator: tuple = (1, 1)
    make_view: bool = False
    view_size: int = 75
    output_setup_details: bool = False
    cycles: int = 1
    setting_name: str = "config"
    smoother: str = "l1jacobi"
    rtol_mode: bool = False  # True: treat tol as relative (TPU f32 runs)


SWEEP_HEADER = ("setting,dim,ndof,mesh_ref,degree,sol_id,sol_pattern_size,"
                "epsv,mode,timestamp,theta,maxrowsum,symop,tol,t_amg_setup,")
SWEEP_DETAILS = "nrows,nze,sparsity,grid,operator,memory,"
SWEEP_TAIL = "t_solve,niters,p_res\n"
VIEW_HEADER = ("setting,dim,ndof,mesh_ref,degree,sol_id,sol_pattern_size,"
               "epsv,mode,timestamp,t_view,view_size,view,view_count,"
               "view_max_pp,view_max_np\n")


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
    header if absent). Returns the path."""
    new = not os.path.exists(out_path)
    problem = StructuredDiffusion(
        pattern_size=cfg.pattern_size, refinements=cfg.refinements,
        degree=cfg.degree, mode=cfg.mode,
        epsv=np.asarray(cfg.epsv) if len(cfg.epsv) else None)

    with open(out_path, "a") as fh:
        if new:
            if cfg.make_view:
                fh.write(VIEW_HEADER)
            else:
                fh.write(SWEEP_HEADER
                         + (SWEEP_DETAILS if cfg.output_setup_details else "")
                         + SWEEP_TAIL)
        for cycle in range(cfg.cycles):
            prob_c = StructuredDiffusion(
                pattern_size=cfg.pattern_size,
                refinements=cfg.refinements + cycle, degree=cfg.degree,
                mode=cfg.mode, epsv=problem.epsv)
            a, b, x0 = prob_c.build()
            prefix = ",".join([
                cfg.setting_name, "3", str(prob_c.ndof),
                str(cfg.refinements + cycle), str(cfg.degree),
                str(prob_c.sol_id), str(cfg.pattern_size),
                _qjoin(list(map(float, prob_c.epsv))), str(cfg.mode),
            ])
            if cfg.make_view:
                _write_view_row(fh, prefix, a, cfg.view_size)
            else:
                _write_sweep_rows(fh, prefix, a, b, x0, cfg)
    return out_path


def _write_view_row(fh, prefix, a, view_size):
    view, t_us = make_view(a, view_size)
    fh.write(prefix + f",{int(time.time())},{int(t_us)},{view_size},")
    fh.write(_qjoin(view.sum.ravel().tolist()) + ",")
    fh.write(_qjoin(view.count.ravel().tolist(), fmt="{}") + ",")
    fh.write(_qjoin(view.max_pp.ravel().tolist()) + ",")
    fh.write(_qjoin(view.max_np.ravel().tolist()) + "\n")


def _write_sweep_rows(fh, prefix, a, b, x0, cfg: SweepConfig):
    for theta in _sweep_values(cfg.strong_threshold):
        for mrs in _sweep_values(cfg.max_row_sum):
            for sym in range(int(cfg.symmetric_operator[0]),
                             int(cfg.symmetric_operator[1]) + 1):
                params = AMGParams(
                    symmetric_operator=bool(sym), strong_threshold=theta,
                    max_row_sum=mrs,
                    output_details=cfg.output_setup_details,
                    smoother=cfg.smoother)
                tol_kw = ({"rtol": cfg.tol, "tol": 0.0} if cfg.rtol_mode
                          else {"tol": cfg.tol})
                res = amg_solve(a, b, params, x0=x0, **tol_kw)
                fields = [prefix, str(int(time.time())), _f(theta), _f(mrs),
                          str(sym), _f(cfg.tol), _f(res.t_amg_setup)]
                if cfg.output_setup_details:
                    fields += res.hierarchy.stats.as_csv_fields()
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
