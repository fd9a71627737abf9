"""AMG setup + solve: strength, PMIS, interpolation, hierarchy, PCG.

Correctness oracles follow SURVEY.md §4: iteration counts / residual
histories on canonical elliptic matrices (an AMG of this class converges on
3D Poisson in O(10-20) PCG iterations with grid complexity ≈ 1.1-1.9).
"""

import numpy as np
import pytest

from amg_ann_tpu.amg import (
    AMGParams, classical_strength, direct_interpolation, pmis, setup,
)
from amg_ann_tpu.fem import diffusion_7pt, jumping_coefficient_field, poisson_7pt
from amg_ann_tpu.solvers import amg_solve
from amg_ann_tpu.sparse import CSR


class TestStrength:
    def test_poisson_all_neighbors_strong(self):
        a = poisson_7pt(4)
        s = classical_strength(a, theta=0.25)
        # symmetric stencil: every off-diagonal is strong, none dropped
        assert s.nnz == a.nnz - a.nrows

    def test_theta_one_keeps_max_only(self):
        # anisotropic row: only the largest connection survives θ=1
        a = CSR.from_dense(np.array([
            [2.0, -1.0, -0.1],
            [-1.0, 2.0, -0.1],
            [-0.1, -0.1, 0.4],
        ]))
        s = classical_strength(a, theta=0.999, max_row_sum=1.0)
        d = s.to_dense()
        assert d[0, 1] > 0 and d[0, 2] == 0
        assert d[1, 0] > 0 and d[1, 2] == 0

    def test_max_row_sum_drops_dominant_rows(self):
        # row 0 strongly diagonally dominant -> all connections weak
        a = CSR.from_dense(np.array([
            [10.0, -0.4, -0.4],
            [-1.0, 2.0, -1.0],
            [-1.0, -1.0, 2.0],
        ]))
        s = classical_strength(a, theta=0.25, max_row_sum=0.9)
        assert np.all(s.to_dense()[0] == 0)
        s_off = classical_strength(a, theta=0.25, max_row_sum=1.0)
        assert np.any(s_off.to_dense()[0] > 0)

    def test_negative_diagonal_flips_sign(self):
        a = CSR.from_dense(np.array([[-2.0, 1.0], [1.0, -2.0]]))
        s = classical_strength(a, theta=0.25, max_row_sum=1.0)
        assert s.nnz == 2  # +1 entries are strong when diag < 0


class TestPMIS:
    def test_valid_splitting_poisson(self):
        a = poisson_7pt(8)
        s = classical_strength(a, 0.25)
        cf = pmis(s)
        nc = cf.sum()
        # sensible coarsening ratio for a 7-point Laplacian under PMIS
        assert 0.05 * a.nrows < nc < 0.6 * a.nrows
        # independence: no two C points strongly connected
        srows, scols, _ = s.row_expand()
        both_c = cf[srows] & cf[scols]
        assert not np.any(both_c)

    def test_every_f_point_near_c(self):
        a = poisson_7pt(8)
        s = classical_strength(a, 0.25)
        cf = pmis(s)
        srows, scols, _ = s.row_expand()
        # every F point with strong connections depends on >=1 C point
        has_strong = np.zeros(a.nrows, dtype=bool)
        has_strong[srows] = True
        f_with_c = np.zeros(a.nrows, dtype=bool)
        np.logical_or.at(f_with_c, srows, cf[scols])
        f_pts = ~cf & has_strong
        assert np.all(f_with_c[f_pts])

    def test_deterministic(self):
        a = poisson_7pt(6)
        s = classical_strength(a, 0.25)
        np.testing.assert_array_equal(pmis(s, seed=3), pmis(s, seed=3))


class TestInterpolation:
    def test_partition_of_unity_on_constant(self):
        """Direct interpolation reproduces constants where A has zero row
        sums (interior of an unscaled FD Laplacian)."""
        a = poisson_7pt(8, scale_h=False)
        s = classical_strength(a, 0.25)
        cf = pmis(s)
        p = direct_interpolation(a, s, cf)
        ones_c = np.ones(p.ncols)
        interp = p.matvec(ones_c)
        # rows whose A row sum is 0 must interpolate 1 exactly
        rows, cols, vals = a.row_expand()
        rs = np.zeros(a.nrows)
        np.add.at(rs, rows, vals)
        interior = np.abs(rs) < 1e-12
        has_c = p.row_nnz > 0
        check = interior & has_c
        assert check.sum() > 0
        np.testing.assert_allclose(interp[check], 1.0, rtol=1e-12)

    def test_c_rows_identity(self):
        a = poisson_7pt(6)
        s = classical_strength(a, 0.25)
        cf = pmis(s)
        p = direct_interpolation(a, s, cf)
        d = p.to_dense()
        coarse_map = np.cumsum(cf) - 1
        for i in np.flatnonzero(cf):
            row = d[i]
            assert row[coarse_map[i]] == 1.0 and np.sum(row != 0) == 1


class TestHierarchy:
    def test_poisson_hierarchy_complexities(self):
        a = poisson_7pt(16)
        h = setup(a, AMGParams(strong_threshold=0.25))
        st = h.stats
        assert st.n_levels >= 2
        assert st.rows[0] == 16**3
        assert all(st.rows[i] > st.rows[i + 1] for i in range(st.n_levels - 1))
        assert 1.0 < st.grid_complexity < 2.0
        assert 1.0 < st.operator_complexity < 3.5
        assert st.memory_complexity >= st.operator_complexity

    def test_galerkin_product_correct(self):
        a = poisson_7pt(6)
        h = setup(a, AMGParams())
        p = h.p_mats[0]
        ac = h.a_mats[1]
        expected = p.to_dense().T @ a.to_dense() @ p.to_dense()
        np.testing.assert_allclose(ac.to_dense(), expected, atol=1e-12)

    def test_coarse_grids_spd(self):
        a = poisson_7pt(8)
        h = setup(a, AMGParams())
        for a_l in h.a_mats:
            d = a_l.to_dense()
            np.testing.assert_allclose(d, d.T, atol=1e-12)
            w = np.linalg.eigvalsh(d)
            assert w.min() > 0


class TestAMGSolve:
    @pytest.mark.parametrize("smoother", ["jacobi", "l1jacobi", "chebyshev"])
    def test_poisson32_converges_fast(self, smoother):
        n = 32
        a = poisson_7pt(n)
        rng = np.random.default_rng(0)
        b = a.matvec(rng.random(n**3))  # consistent rhs
        res = amg_solve(a, b, AMGParams(smoother=smoother), rtol=1e-8, tol=0.0)
        assert res.converged
        assert res.niters <= 30, f"{smoother}: {res.niters} iters"
        # true residual check
        r = b - a.matvec(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6

    def test_residual_history_contract(self):
        a = poisson_7pt(16)
        b = np.ones(16**3)
        res = amg_solve(a, b, AMGParams(), rtol=1e-8, tol=0.0)
        # includes iteration 0 and one entry per iteration
        assert len(res.p_res) == res.niters + 1
        assert np.all(np.isfinite(res.p_res))
        assert res.p_res[-1] < 1e-8 * res.p_res[0]
        assert 0.0 < res.rho < 1.0

    def test_jumping_coefficients(self):
        n = 32
        rng = np.random.default_rng(1)
        eps = rng.uniform(0, 4, size=4**3)
        kappa = jumping_coefficient_field(n, 4, eps, mode=3)
        a = diffusion_7pt(kappa)
        b = a.matvec(rng.random(n**3))
        res = amg_solve(a, b, AMGParams(strong_threshold=0.25),
                        rtol=1e-8, tol=0.0)
        assert res.converged and res.niters <= 40
        r = b - a.matvec(res.x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6

    def test_absolute_tolerance_mode(self):
        a = poisson_7pt(12)
        b = np.ones(12**3)
        res = amg_solve(a, b, AMGParams(), tol=1e-8)
        assert res.converged
        assert res.p_res[-1] < 1e-8

    def test_theta_sensitivity_exists(self):
        """niters(θ) must vary — the whole ANN story depends on it."""
        n = 24
        rng = np.random.default_rng(2)
        eps = rng.uniform(0, 6, size=2**3)
        kappa = jumping_coefficient_field(n, 2, eps, mode=3)
        a = diffusion_7pt(kappa)
        b = a.matvec(rng.random(n**3))
        iters = []
        for theta in (0.1, 0.5, 0.9):
            res = amg_solve(a, b, AMGParams(strong_threshold=theta),
                            rtol=1e-8, tol=0.0)
            assert res.converged
            iters.append(res.niters)
        assert len(set(iters)) > 1, f"no θ sensitivity: {iters}"


class TestWCycle:
    def test_w_cycle_converges_no_slower(self):
        a = poisson_7pt(16)
        b = a.matvec(np.random.default_rng(0).random(16**3))
        rv = amg_solve(a, b, AMGParams(cycle_type="V"), rtol=1e-8, tol=0.0)
        rw = amg_solve(a, b, AMGParams(cycle_type="W"), rtol=1e-8, tol=0.0)
        assert rv.converged and rw.converged
        assert rw.niters <= rv.niters

    def test_invalid_cycle_type(self):
        import pytest as _pt

        with _pt.raises(ValueError):
            AMGParams(cycle_type="F")


class TestHierarchyReuseParams:
    def test_solve_time_smoother_honored(self):
        """Passing a different smoother with a prebuilt hierarchy must be
        honored, not silently replaced by the hierarchy's smoother."""
        a = poisson_7pt(16)
        b = a.matvec(np.random.default_rng(0).random(16**3))
        h = setup(a, AMGParams(smoother="l1jacobi"))
        r_l1 = amg_solve(a, b, AMGParams(smoother="l1jacobi"),
                         hierarchy=h, rtol=1e-8, tol=0.0)
        r_ch = amg_solve(a, b, AMGParams(smoother="chebyshev"),
                         hierarchy=h, rtol=1e-8, tol=0.0)
        assert r_ch.niters < r_l1.niters

    def test_setup_param_mismatch_rejected(self):
        a = poisson_7pt(8)
        h = setup(a, AMGParams(strong_threshold=0.25))
        with pytest.raises(ValueError, match="strong_threshold"):
            amg_solve(a, np.ones(8**3),
                      AMGParams(strong_threshold=0.7), hierarchy=h)


class TestShapeBuckets:
    def test_bucketed_solve_matches_exact(self):
        a = poisson_7pt(13)   # 2197 dofs, odd size
        b = a.matvec(np.random.default_rng(0).random(13**3))
        r0 = amg_solve(a, b, AMGParams(), rtol=1e-8, tol=0.0)
        r1 = amg_solve(a, b, AMGParams(shape_buckets=True),
                       rtol=1e-8, tol=0.0)
        assert r1.converged
        assert r1.niters == r0.niters
        np.testing.assert_allclose(r1.x, r0.x, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(r1.p_res, r0.p_res, rtol=1e-8)

    def test_nearby_sizes_collide_to_one_bucket(self):
        """Sizes within a quarter-octave interval share a padded size —
        the property that lets θ-sweeps reuse jitted solves."""
        from amg_ann_tpu.amg.hierarchy import row_granule

        def padded(n):
            g = row_granule(n)
            return -(-n // g) * g

        # coarse-level size jitter of a few % collides
        assert padded(9000) == padded(9100) == padded(9400)
        assert padded(82061) == padded(83500)  # ~2% apart
        # far-apart sizes do not
        assert padded(9000) != padded(14000)


class TestDenseCoarseLevels:
    """Classical coarse levels below dense_coarse_threshold store dense
    operators (MXU matmul instead of the gather-bound ELL SpMV)."""

    def test_dense_levels_present_and_solve_matches(self):
        from amg_ann_tpu.sparse.ell import DenseOp

        a = poisson_7pt(12)
        b = a.matvec(np.random.default_rng(0).random(a.nrows))
        h_dense = setup(a, AMGParams(dense_coarse_threshold=2048))
        h_ell = setup(a, AMGParams(dense_coarse_threshold=0))
        kinds_d = [type(l.a).__name__ for l in h_dense.device.levels]
        kinds_e = [type(l.a).__name__ for l in h_ell.device.levels]
        assert "DenseOp" in kinds_d and "DenseOp" not in kinds_e
        rd = amg_solve(a, b, hierarchy=h_dense,
                       params=AMGParams(dense_coarse_threshold=2048),
                       rtol=1e-8, tol=0.0)
        re_ = amg_solve(a, b, hierarchy=h_ell,
                        params=AMGParams(dense_coarse_threshold=0),
                        rtol=1e-8, tol=0.0)
        assert rd.converged and rd.niters == re_.niters
        np.testing.assert_allclose(rd.x, re_.x, rtol=1e-9, atol=1e-12)
