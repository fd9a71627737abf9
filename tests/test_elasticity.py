"""testcase3 parity: vector linear elasticity."""

import numpy as np
import pytest

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem.elasticity import (
    LinearElasticity, MIN_YOUNG, POISSON_RATIO, make_epsv,
)
from amg_ann_tpu.fem.structured import compute_order
from amg_ann_tpu.solvers import amg_solve


class TestMaterial:
    def test_epsv_sharp_binarizes(self):
        e = make_epsv(0, 100, 4.0, sharp=True)
        assert set(np.unique(e)) <= {1.0, 10.0**4}

    def test_lame_fields(self):
        p = LinearElasticity(pattern_size=2, refinements=0,
                             epsv=np.ones(8))
        mu, lam = p.mu_lambda_cells()
        np.testing.assert_allclose(mu, MIN_YOUNG / (1 + POISSON_RATIO))
        np.testing.assert_allclose(
            lam, mu * POISSON_RATIO / (1 - 2 * POISSON_RATIO))


class TestAssembly:
    def test_matrix_symmetric_spd(self):
        p = LinearElasticity(pattern_size=2, refinements=0, epsv=np.ones(8))
        a, b, x0 = p.build()
        d = a.to_dense()
        np.testing.assert_allclose(d, d.T, atol=1e-9 * np.abs(d).max())
        assert np.linalg.eigvalsh(d).min() > 0

    def test_rigid_body_translation_in_kernel(self):
        """Unconstrained elasticity operator annihilates translations."""
        p = LinearElasticity(pattern_size=2, refinements=0, epsv=np.ones(8))
        a = p.assemble_matrix()
        for comp in range(3):
            t = np.zeros(p.ndof)
            t[comp::3] = 1.0
            r = a.matvec(t)
            assert np.abs(r).max() < 1e-9 * np.abs(a.data).max()

    def test_l2_convergence(self):
        errs = []
        for ref in (1, 2, 3):
            p = LinearElasticity(pattern_size=1, refinements=ref,
                                 epsv=np.ones(1))
            a, b, x0 = p.build()
            x = np.linalg.solve(a.to_dense(), b)
            errs.append(p.compute_l2_error(x))
        orders = compute_order(errs)
        assert orders[-1] > 2 - 0.25, (errs, orders)


class TestSolve:
    def test_amg_on_elasticity(self):
        p = LinearElasticity(pattern_size=2, refinements=2, seed=3,
                             max_young=2.0)
        a, b, x0 = p.build()
        res = amg_solve(
            a, b,
            AMGParams(strong_threshold=0.5,
                      aggressive_coarsening_num_levels=0),
            x0=x0, rtol=1e-8, tol=0.0)
        assert res.converged, res.niters
        assert res.niters <= 80, res.niters

    def test_aggressive_coarsening_reduces_complexity(self):
        p = LinearElasticity(pattern_size=2, refinements=2, seed=1)
        a, b, x0 = p.build()
        from amg_ann_tpu.amg import setup

        h0 = setup(a, AMGParams(strong_threshold=0.5))
        h2 = setup(a, AMGParams(strong_threshold=0.5,
                                aggressive_coarsening_num_levels=2))
        assert (h2.stats.grid_complexity < h0.stats.grid_complexity)
