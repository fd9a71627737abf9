"""Structured FEM: manufactured-solution convergence orders (the strongest
oracle in the reference, SURVEY.md §4) + assembly/BC invariants."""

import numpy as np
import pytest

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem.structured import StructuredDiffusion, compute_order
from amg_ann_tpu.solvers import amg_solve


def solve_direct(problem, eliminate_columns=True):
    a, b, x0 = problem.build(eliminate_columns)
    x = np.linalg.solve(a.to_dense(), b)
    return x


class TestAssembly:
    def test_reference_stiffness_q1_rowsums(self):
        """K̂ annihilates constants (pure-Neumann element matrix)."""
        p = StructuredDiffusion(pattern_size=1, refinements=1)
        k = p.reference_stiffness()
        np.testing.assert_allclose(k @ np.ones(8), 0.0, atol=1e-14)
        np.testing.assert_allclose(k, k.T, atol=1e-14)

    def test_matrix_spd_after_bc(self):
        p = StructuredDiffusion(pattern_size=2, refinements=1)
        a, b, x0 = p.build()
        d = a.to_dense()
        np.testing.assert_allclose(d, d.T, atol=1e-13)
        # SPD on the free dofs (bc rows are decoupled identity-like)
        assert np.linalg.eigvalsh(d).min() > 0

    def test_mu_pattern_modes(self):
        eps = np.arange(8, dtype=float)
        p = StructuredDiffusion(pattern_size=2, refinements=1, mode=3,
                                epsv=eps)
        mu = p.mu_cells()
        # cell (0,0,0) -> indicator 0; (fine 2,*,*) is macro x=1 -> +1
        assert mu[0, 0, 0] == 10.0 ** eps[0]
        assert mu[2, 0, 0] == 10.0 ** eps[1]      # x contributes ps^0
        assert mu[0, 2, 0] == 10.0 ** eps[2]      # y contributes ps^1
        assert mu[0, 0, 2] == 10.0 ** eps[4]      # z contributes ps^2
        p1 = StructuredDiffusion(pattern_size=2, refinements=1, mode=1,
                                 epsv=eps[:2])
        assert np.all(p1.mu_cells()[0] == 10.0 ** eps[0])
        assert np.all(p1.mu_cells()[3] == 10.0 ** eps[1])

    def test_epsv_size_validation(self):
        with pytest.raises(ValueError):
            StructuredDiffusion(pattern_size=2, refinements=0, mode=3,
                                epsv=np.zeros(5))


class TestConvergence:
    @pytest.mark.parametrize("degree", [1, 2])
    def test_orders_uniform_coefficient(self, degree):
        """L2 order ≈ p+1, H1 order ≈ p (tolerance −0.2 like the
        reference's compute_order verdict, main.cpp:388-398)."""
        errs = []
        refs = (2, 3, 4) if degree == 1 else (1, 2, 3)
        for ref in refs:
            p = StructuredDiffusion(pattern_size=1, refinements=ref,
                                    degree=degree)
            x = solve_direct(p)
            errs.append(p.compute_errors(x))
        l2 = [e[0] for e in errs]
        h1 = [e[1] for e in errs]
        loo = [e[2] for e in errs]
        assert np.all(compute_order(l2) > degree + 1 - 0.2), l2
        assert np.all(compute_order(h1) > degree - 0.2), h1
        # L∞ (sampled at quad points) is noisier preasymptotically — check
        # the final refinement pair only
        assert compute_order(loo)[-1] > degree + 1 - 0.35, loo

    def test_orders_jumping_coefficient(self):
        """Pattern-aligned jumps: the manufactured solution still converges
        at full order because the reference's RHS carries μ inside."""
        rng = np.random.default_rng(0)
        eps = rng.uniform(0, 2, size=8)
        errs = []
        for ref in (1, 2, 3):
            p = StructuredDiffusion(pattern_size=2, refinements=ref,
                                    degree=1, mode=3, epsv=eps)
            x = solve_direct(p)
            errs.append(p.compute_errors(x))
        l2 = [e[0] for e in errs]
        assert np.all(compute_order(l2) > 2 - 0.2), l2

    def test_nonsymmetric_bc_variant_same_solution(self):
        """eliminate_columns=False (reference parity) must produce the same
        discrete solution."""
        p = StructuredDiffusion(pattern_size=2, refinements=1)
        x_sym = solve_direct(p, eliminate_columns=True)
        x_ref = solve_direct(p, eliminate_columns=False)
        np.testing.assert_allclose(x_sym, x_ref, atol=1e-10)


class TestWithAMG:
    def test_solve_q1_jumping(self):
        rng = np.random.default_rng(1)
        eps = rng.uniform(0, 4, size=8)
        p = StructuredDiffusion(pattern_size=2, refinements=3, degree=1,
                                mode=3, epsv=eps)
        a, b, x0 = p.build()
        res = amg_solve(a, b, AMGParams(strong_threshold=0.25), x0=x0,
                        rtol=1e-10, tol=0.0)
        assert res.converged and res.niters < 40
        l2, h1, loo = p.compute_errors(res.x)
        # discretization-level accuracy
        x_direct = np.linalg.solve(a.to_dense(), b)
        l2d, _, _ = p.compute_errors(x_direct)
        assert abs(l2 - l2d) / l2d < 1e-4
