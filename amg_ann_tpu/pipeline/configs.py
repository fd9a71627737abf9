"""Experiment-grid generators — the reference's per-app `create_jsons()`
(testcase*/datagen.py) re-expressed over SweepConfig.

Grids follow the reference's datagen files (scaled-down defaults are
provided since full grids are cluster-scale — tc1 alone is 10 800 runs,
testcase1 datagen.py:18-37):

  tc1: deg × mesh × renumbering × base_ref × maxdiff × seeds,
       θ ∈ 0.05..0.96 step 0.025
  tc2: mode ∈ {1,2,3}, pattern_size, cycles = 8 − deg − log2(ps),
       θ ∈ 0.05..0.96 step 0.05, mrs (0.9,0.9), sym (1,1)
  tc2.1: refinements × diffusion exponents × marked points on diagonals,
       θ ∈ 0.05..0.95 step 0.0125
  tc3: deg × mode × ps × sharp × max_young × seeds,
       θ ∈ 0.15..0.91 step 0.025, aggressive_coarsening = 2
"""

from __future__ import annotations

import numpy as np

from .datagen import APP_TC1, APP_TC2, APP_TC21, APP_TC3, SweepConfig


def tc2_configs(pattern_size=4, modes=(1, 2, 3), degrees=(1,),
                n_seeds=3, eps_amplitude=3.0, refinements=None,
                cycles=1, theta=(0.05, 0.96, 0.05), tol=1e-8,
                rtol_mode=False, seed0=0):
    """testcase2 grid (datagen.py:29-52; ε random here instead of the
    committed all-zero pattern — datagen.py:31,41 note)."""
    out = []
    for mode in modes:
        for deg in degrees:
            for s in range(n_seeds):
                rng = np.random.default_rng(seed0 + s)
                eps = rng.uniform(0.0, eps_amplitude, pattern_size ** mode)
                ref = (refinements if refinements is not None
                       else max(1, 6 - deg - int(np.log2(pattern_size))))
                out.append(SweepConfig(
                    app=APP_TC2,
                    problem=dict(pattern_size=pattern_size, mode=mode,
                                 degree=deg, refinements=ref,
                                 epsv=tuple(eps)),
                    strong_threshold=theta, tol=tol, cycles=cycles,
                    rtol_mode=rtol_mode,
                    setting_name=f"tc2_m{mode}_d{deg}_s{s}"))
    return out


def tc1_configs(meshes=("Cube", "HyperBall", "Cylinder"), degrees=(1,),
                base_refs=(1,), maxdiffs=(1.0, 3.0), n_seeds=3,
                theta=(0.05, 0.96, 0.025), tol=1e-8, rtol_mode=False,
                renumberings=("none",)):
    """testcase1 grid (datagen.py:18-37)."""
    out = []
    for mesh in meshes:
        for deg in degrees:
            for ref in base_refs:
                for md in maxdiffs:
                    for rn in renumberings:
                        for s in range(n_seeds):
                            out.append(SweepConfig(
                                app=APP_TC1,
                                problem=dict(mesh=mesh, refinements=ref,
                                             seed=s, max_diffusion=md,
                                             renumbering=rn,
                                             freq=np.pi / 2),
                                strong_threshold=theta, tol=tol,
                                rtol_mode=rtol_mode,
                                setting_name=f"tc1_{mesh}_r{ref}_m{md}_s{s}"))
    return out


def tc21_configs(refinements=(2, 3, 4), diffusion_exps=(0, 1, 2, 4, 8),
                 n_points_per_diagonal=3, solver_mode=1, tol=1e-8,
                 rtol_mode=False, structured=False, smoother="l1jacobi"):
    """testcase2.1 grid (datagen.py:20-44): marked points along the main
    diagonal; θ grid hardcoded by the app (main.cpp:334).

    structured=True routes the degree-1 θ-sweeps (solver_mode 1) through
    the all-DIA TPU fast path — same rows, device-time sweeps (pass
    rtol-style tol 1e-6 and smoother='chebyshev' for TPU datasets)."""
    pts = [(t, t, t) for t in np.linspace(0.0, 0.9, n_points_per_diagonal)]
    out = []
    for ref in refinements:
        for d in diffusion_exps:
            for mp in pts:
                out.append(SweepConfig(
                    app=APP_TC21,
                    problem=dict(num_ref=ref, diffusion_exp=float(d),
                                 marked_point=tuple(mp)),
                    strong_threshold=(0.05, 0.95, 0.0125),
                    solver_mode=solver_mode, tol=tol, rtol_mode=rtol_mode,
                    structured=structured, smoother=smoother,
                    setting_name=f"tc21_r{ref}_d{d}"))
    return out


def tc3_configs(degrees=(1,), modes=(1, 3), pattern_sizes=(2,),
                sharps=(False, True), max_youngs=(1.0, 2.0), n_seeds=2,
                base_ref=1, theta=(0.15, 0.91, 0.025), tol=1e-8,
                rtol_mode=False, structured=False, smoother="l1jacobi"):
    """testcase3 grid (datagen.py:16-37; aggressive coarsening 2 as the
    app hardcodes, main.cpp:454-464).

    structured=True routes degree-1 θ-sweeps through the unknown-based
    block structured path (amg/boxmg_block.py) — all-banded vector
    V-cycles (pass tol 1e-6 and smoother='chebyshev' for TPU datasets)."""
    out = []
    for deg in degrees:
        for mode in modes:
            for ps in pattern_sizes:
                for sharp in sharps:
                    for my in max_youngs:
                        for s in range(n_seeds):
                            out.append(SweepConfig(
                                app=APP_TC3,
                                problem=dict(pattern_size=ps, mode=mode,
                                             degree=deg, seed=s,
                                             max_young=my, sharp=sharp,
                                             refinements=base_ref),
                                strong_threshold=theta,
                                aggressive_levels=2, tol=tol,
                                rtol_mode=rtol_mode, structured=structured,
                                smoother=smoother,
                                setting_name=(f"tc3_m{mode}_ps{ps}"
                                              f"_sh{int(sharp)}_y{my}_s{s}")))
    return out
