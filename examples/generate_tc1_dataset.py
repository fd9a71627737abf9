"""tc1 (unstructured P1/P2 tets) dataset at view_size 75.

Classical-path sweeps (unstructured matrices have no banded structure);
sizes to ~10⁵ DoFs — the classical CPU path at reference-maximal 2M DoFs
would take days per the reference's own warning (README.md:11); the
2M-DoF scale is demonstrated by the tc2 structured dataset instead.

    python examples/generate_tc1_dataset.py [--out data/raw/tc1-ref]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_configs(n_seeds: int = 3, extended: bool = False,
                 theta_step: float = 0.05, seed_offset: int = 0,
                 name_suffix: str = ""):
    """Base grid: 9 mesh families × refinements × degree 1-2 × seeds, all
    at maxdiff=6 / cuthill_mckee. `extended` adds the reference's other
    sweep axes (datagen.py:26-34): max diffusion exponent ∈ {1, 3, 10}
    (conditioning structure) and the remaining three renumberings (the
    view image the CNN sees changes with the bandwidth pattern)."""
    from amg_ann_tpu.pipeline.datagen import APP_TC1, SweepConfig

    cfgs = []
    # Simplex's base mesh is ONE tet — r1/r2 give 10/35-DoF toys whose
    # views degenerate (all-zero max_np channel); r4/r5 put it in the same
    # ndof band as the other families.
    for mesh, refs in (("Cube", (1, 2)), ("HyperBall", (1, 2)),
                       ("Cylinder", (1, 2)), ("Cheese", (1,)),
                       ("ReplicateHoles", (1,)), ("Torus", (1, 2)),
                       ("PlateWithHole", (1, 2)), ("Simplex", (4, 5)),
                       ("ReplicateCross", (1,))):
        for ref in refs:
            for deg in (1, 2) if ref == refs[0] else (1,):
                for seed in range(seed_offset, seed_offset + n_seeds):
                    cfgs.append(SweepConfig(
                        app=APP_TC1,
                        problem=dict(mesh=mesh, refinements=ref,
                                     degree=deg, seed=seed,
                                     max_diffusion=6.0,
                                     renumbering="cuthill_mckee"),
                        tol=1e-6, rtol_mode=True, smoother="chebyshev",
                        strong_threshold=(0.05, 0.96, theta_step),
                        cycles=1,
                        setting_name=f"tc1ref-{mesh}-r{ref}-d{deg}-s{seed}{name_suffix}",
                    ))
        if extended:
            # extended axes follow n_seeds (degree-3 stays a thin parity
            # slice: P3 assembly is the slowest per problem)
            ref, nsx = refs[0], n_seeds
            for seed in range(seed_offset, seed_offset + min(n_seeds, 2)):   # degree-3 parity slice
                cfgs.append(SweepConfig(
                    app=APP_TC1,
                    problem=dict(mesh=mesh, refinements=ref, degree=3,
                                 seed=seed, max_diffusion=6.0,
                                 renumbering="cuthill_mckee"),
                    tol=1e-6, rtol_mode=True, smoother="chebyshev",
                    strong_threshold=(0.05, 0.96, theta_step), cycles=1,
                    setting_name=f"tc1ref-{mesh}-r{ref}-d3-s{seed}{name_suffix}",
                ))
            for md in (1.0, 3.0, 10.0):
                for seed in range(seed_offset, seed_offset + nsx):
                    cfgs.append(SweepConfig(
                        app=APP_TC1,
                        problem=dict(mesh=mesh, refinements=ref, degree=1,
                                     seed=seed, max_diffusion=md,
                                     renumbering="cuthill_mckee"),
                        tol=1e-6, rtol_mode=True, smoother="chebyshev",
                        strong_threshold=(0.05, 0.96, theta_step), cycles=1,
                        setting_name=(f"tc1ref-{mesh}-r{ref}-d1-s{seed}"
                                      f"-m{md:g}{name_suffix}"),
                    ))
            for renum in ("none", "king_ordering", "subdomain_wise"):
                for seed in range(seed_offset, seed_offset + nsx):
                    cfgs.append(SweepConfig(
                        app=APP_TC1,
                        problem=dict(mesh=mesh, refinements=ref, degree=1,
                                     seed=seed, max_diffusion=6.0,
                                     renumbering=renum),
                        tol=1e-6, rtol_mode=True, smoother="chebyshev",
                        strong_threshold=(0.05, 0.96, theta_step), cycles=1,
                        setting_name=(f"tc1ref-{mesh}-r{ref}-d1-s{seed}"
                                      f"-{renum}{name_suffix}"),
                    ))
    return cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/tc1-ref")
    ap.add_argument("--view-size", type=int, default=75)
    ap.add_argument("--pooling-only", action="store_true")
    ap.add_argument("--times-only", action="store_true")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--extended", action="store_true",
                    help="add max-diffusion {1,3,10} and the other renumberings")
    ap.add_argument("--resume", action="store_true",
                    help="keep the existing stats.csv and skip configs "
                         "whose setting name already appears in it")
    ap.add_argument("--fine-theta", action="store_true",
                    help="37-point reference theta grid (0.05-0.96/0.025, "
                         "testcase1 datagen.py:33 — gives SavGol(21,7) its "
                         "designed window) with NEW seeds (offset 100) and "
                         "a '-f' name suffix so it never collides with the "
                         "19-point tranches")
    ap.add_argument("--shard", type=int, nargs=2, metavar=("K", "N"),
                    help="process configs[K::N] only — run N processes "
                         "with distinct --out dirs (each pinned to one "
                         "core) and concatenate the CSVs afterwards")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from amg_ann_tpu.pipeline.datagen import run_config

    kw = (dict(theta_step=0.025, seed_offset=100, name_suffix="-f")
          if args.fine_theta else {})
    cfgs = make_configs(args.seeds, extended=args.extended, **kw)
    if args.shard:
        k, nsh = args.shard
        cfgs = cfgs[k::nsh]
        print(f"shard {k}/{nsh}", flush=True)
    print(f"{len(cfgs)} configurations (cpu classical path)")
    jobs = []
    if not args.pooling_only:
        jobs.append(("times", cfgs))
    if not args.times_only:
        pool = [dataclasses.replace(c, make_view=True,
                                    view_size=args.view_size,
                                    strong_threshold=(0.0, 0.0, 0.0))
                for c in cfgs]
        jobs.append((f"pooling{args.view_size}", pool))
    for sub, job_cfgs in jobs:
        outdir = os.path.join(args.out, sub)
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, "stats.csv")
        done = set()
        if os.path.exists(path):
            if args.resume:
                with open(path) as fh:
                    done = {ln.split(",", 1)[0] for ln in fh}
            else:
                os.remove(path)
        t00 = time.time()
        for i, cfg in enumerate(job_cfgs):
            if cfg.setting_name in done:
                print(f"[{sub} {i + 1}/{len(job_cfgs)}] {cfg.setting_name} "
                      f"resumed (skip)", flush=True)
                continue
            t0 = time.time()
            run_config(cfg, path)
            print(f"[{sub} {i + 1}/{len(job_cfgs)}] {cfg.setting_name} "
                  f"{time.time() - t0:.1f}s (total {time.time() - t00:.0f}s)",
                  flush=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
