"""testcase2.1 parity: single-cell diffusion + native eigenanalysis."""

import numpy as np
import pytest

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem.singlecell import SingleCellDiffusion
from amg_ann_tpu.solvers import amg_solve
from amg_ann_tpu.solvers.eigen import dense_extremal, lanczos_extremal
from amg_ann_tpu.sparse import CSR


class TestProblem:
    def test_marked_cell_lookup(self):
        p = SingleCellDiffusion(num_ref=3, marked_point=(0.0, 0.0, 0.0))
        # point at origin: cell index floor((0+1)/0.25) = 4 of 8
        assert p.marked_cell() == (4, 4, 4)
        p2 = SingleCellDiffusion(num_ref=2, marked_point=(-1.0, 0.99, 0.0))
        assert p2.marked_cell() == (0, 3, 2)

    def test_mu_field(self):
        p = SingleCellDiffusion(num_ref=2, diffusion_exp=3.0)
        mu = p.mu_cells()
        assert mu[p.marked_cell()] == 1e3
        assert np.sum(mu != 1.0) == 1

    def test_solvable_and_conditioning_grows(self):
        """Larger jumps worsen conditioning — the paper's core observation."""
        conds = []
        for d in (0.0, 4.0):
            p = SingleCellDiffusion(num_ref=2, diffusion_exp=d)
            a, b, x0 = p.build()
            eig = dense_extremal(a)
            conds.append(eig.lam_max / eig.lam_min)
        assert conds[1] > conds[0]

    def test_amg_solve(self):
        p = SingleCellDiffusion(num_ref=3, diffusion_exp=6.0)
        a, b, x0 = p.build()
        res = amg_solve(a, b, AMGParams(), x0=x0, rtol=1e-8, tol=0.0)
        assert res.converged and res.niters < 40


class TestLanczos:
    def test_matches_dense_on_random_spd(self, rng):
        n = 60
        q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        w = np.sort(rng.random(n) * 10 + 0.1)
        a = CSR.from_dense(q @ np.diag(w) @ q.T)
        eig = lanczos_extremal(a, m=60)
        np.testing.assert_allclose(eig.lam_min, w[0], rtol=1e-8)
        np.testing.assert_allclose(eig.lam_max, w[-1], rtol=1e-8)

    def test_extremal_on_fem_matrix(self):
        p = SingleCellDiffusion(num_ref=2, diffusion_exp=2.0)
        a, _, _ = p.build()
        ref = dense_extremal(a)
        lan = lanczos_extremal(a, m=min(120, a.nrows))
        np.testing.assert_allclose(lan.lam_max, ref.lam_max, rtol=1e-6)
        np.testing.assert_allclose(lan.lam_min, ref.lam_min, rtol=1e-4)
