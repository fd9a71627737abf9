"""Hex-Q1 vs tet-P1 discretization comparability study (tc1 parity note).

The reference's testcase 1 assembles hexahedral FE_Q elements
(reference: testcase1-diffusion-unstructured/src/main.cpp); this repo's
tc1 uses simplicial P1/P2/P3 tets (documented deviation, fem/tet_elements
header). Round-3 review asked for an experiment pinning that the
iteration-count / θ* statistics the ANN learns from are comparable
between the two discretizations (VERDICT r3 missing #5).

Protocol: the SAME PDE family — Poisson with μ = 10^ε piecewise-constant
on the 2×2×2 octants of the cube, ε ~ U(0, maxdiff) per octant — solved
with (a) hex Q1 tensor assembly (fem/structured.py, the reference's tc2
machinery on a 2-macro-cell pattern = tc1's Cube with a coefficient
ancestor pattern) and (b) tet P1 assembly (fem/unstructured.py, Cube
mesh). Both sweep the reference θ grid through the CLASSICAL hierarchy
(strength/PMIS/interp — the AMG whose θ-sensitivity the dataset records)
and report niters(θ), ρ(θ), θ*_niters and the cross-discretization curve
correlation over seeds.

    python examples/hex_vs_tet_study.py [--seeds 5] [--out data/hex_vs_tet.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

THETAS = np.round(np.arange(0.05, 0.951, 0.05), 2)


def sweep(a, b, thetas, smoother="l1jacobi"):
    from amg_ann_tpu.amg import AMGParams
    from amg_ann_tpu.solvers import amg_solve

    niters, rhos = [], []
    for th in thetas:
        r = amg_solve(a, b, AMGParams(
            strong_threshold=float(th), smoother=smoother,
            dtype=np.float32), rtol=1e-6, tol=0.0)
        niters.append(int(r.niters))
        rhos.append(float(r.rho))
    return niters, rhos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--refine", type=int, default=2,
                    help="tet refinements (2 → 36k dofs)")
    ap.add_argument("--maxdiff", type=float, default=3.0)
    ap.add_argument("--out", default="data/hex_vs_tet.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from amg_ann_tpu.fem.structured import StructuredDiffusion
    from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion

    rows = []
    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        eps = rng.uniform(0.0, args.maxdiff, 8)       # shared octant field

        hexp = StructuredDiffusion(pattern_size=2,
                                   refinements=args.refine + 2, degree=1,
                                   mode=3, epsv=eps)
        ah, bh, _ = hexp.build()
        tetp = UnstructuredDiffusion(mesh="Cube",
                                     refinements=args.refine, seed=seed,
                                     max_diffusion=args.maxdiff, degree=1)
        at, bt, _ = tetp.build()

        nh, rh = sweep(ah, bh, THETAS)
        nt, rt = sweep(at, bt, THETAS)
        corr_n = float(np.corrcoef(nh, nt)[0, 1])
        corr_r = float(np.corrcoef(rh, rt)[0, 1])
        row = {
            "seed": seed,
            "ndof_hex": ah.nrows, "ndof_tet": at.nrows,
            "niters_hex": nh, "niters_tet": nt,
            "rho_hex": [round(v, 4) for v in rh],
            "rho_tet": [round(v, 4) for v in rt],
            "theta_star_hex": float(THETAS[int(np.argmin(nh))]),
            "theta_star_tet": float(THETAS[int(np.argmin(nt))]),
            "niters_corr": corr_n, "rho_corr": corr_r,
        }
        rows.append(row)
        print(json.dumps({k: row[k] for k in
                          ("seed", "theta_star_hex", "theta_star_tet",
                           "niters_corr", "rho_corr")}), flush=True)

    summary = {
        "thetas": THETAS.tolist(),
        "rows": rows,
        "mean_niters_corr": float(np.mean([r["niters_corr"]
                                           for r in rows])),
        "mean_rho_corr": float(np.mean([r["rho_corr"] for r in rows])),
        "theta_star_abs_diff": float(np.mean(
            [abs(r["theta_star_hex"] - r["theta_star_tet"])
             for r in rows])),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", args.out)
    print({k: summary[k] for k in ("mean_niters_corr", "mean_rho_corr",
                                   "theta_star_abs_diff")})


if __name__ == "__main__":
    main()
