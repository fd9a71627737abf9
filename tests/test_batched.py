"""Batched-RHS solve (krylov.pcg_batched + amg_solve_batched).

The batched loop must reproduce per-RHS `amg_solve` results lane for lane
— frozen-lane batching means a converged lane's x/niters/history are
unaffected by slower lanes still iterating. The reference solves one RHS
per process (common/amg_solver.h:22-92); this is TPU-native serving
surface (one hierarchy, one fused device loop for B solves).
"""

import numpy as np
import pytest

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem import diffusion_7pt, jumping_coefficient_field, poisson_7pt
from amg_ann_tpu.solvers import amg_solve, amg_solve_batched, cg, pcg_batched


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestPCGBatched:
    def test_identity_precond_matches_cg(self, rng):
        """Batched PCG with identity preconditioner == per-lane cg."""
        import jax.numpy as jnp

        n, nb = 96, 4
        m = rng.random((n, n))
        # well-conditioned SPD: batched-matmul reduction order differs
        # from the single-vector lowering, and an ill-conditioned CG
        # amplifies that roundoff into trajectory divergence
        a = jnp.asarray(0.1 * (m @ m.T) + n * np.eye(n))
        bs = jnp.asarray(rng.random((nb, n)))
        matvec1 = lambda v: a @ v
        matvec = lambda v: v @ a.T
        res = pcg_batched(matvec, lambda r: r, bs, jnp.zeros_like(bs),
                          rtol=1e-10, maxiter=300)
        for i in range(nb):
            ref = cg(matvec1, bs[i], jnp.zeros(n), rtol=1e-10, maxiter=300)
            assert int(res.niters[i]) == int(ref.niters)
            np.testing.assert_allclose(np.asarray(res.x[i]),
                                       np.asarray(ref.x), rtol=1e-8)
            k = int(ref.niters)
            np.testing.assert_allclose(np.asarray(res.history[i, :k + 1]),
                                       np.asarray(ref.history[:k + 1]),
                                       rtol=1e-5)

    def test_per_lane_thresholds(self, rng):
        """(B,)-shaped rtol: lanes stop at their own targets."""
        import jax.numpy as jnp

        n = 64
        m = rng.random((n, n))
        a = jnp.asarray(m @ m.T + n * np.eye(n))
        bs = jnp.asarray(np.tile(rng.random(n), (2, 1)))
        rtols = jnp.asarray([1e-3, 1e-10])
        res = pcg_batched(lambda v: v @ a.T, lambda r: r, bs,
                          jnp.zeros_like(bs), rtol=rtols, maxiter=300)
        assert int(res.niters[0]) < int(res.niters[1])
        assert bool(res.converged.all())


class TestAMGSolveBatched:
    @pytest.mark.parametrize("structured", [False, True])
    def test_matches_per_rhs_solves(self, rng, structured):
        n, nb = 16, 3
        a = poisson_7pt(n, dtype=np.float32)
        bs = rng.random((nb, n ** 3)).astype(np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32)
        kw = dict(grid_shape=(n, n, n)) if structured else {}
        batch = amg_solve_batched(a, bs, params, rtol=1e-6, tol=0.0, **kw)
        assert len(batch) == nb
        h = batch[0].hierarchy
        for i, res in enumerate(batch):
            ref = amg_solve(a, bs[i], params, rtol=1e-6, tol=0.0,
                            hierarchy=h)
            assert res.niters == ref.niters
            assert res.converged
            np.testing.assert_allclose(res.p_res, ref.p_res, rtol=5e-3)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-3, atol=1e-6)

    def test_heterogeneous_convergence_lanes_freeze(self, rng):
        """A hard lane (jumping coefficients RHS structure) must not
        perturb an easy lane's converged state."""
        n = 12
        eps = rng.uniform(0, 4, size=4 ** 3)
        mu = jumping_coefficient_field(n, 4, eps, mode=3)
        a = diffusion_7pt(mu)
        nd = a.nrows
        easy = a.matvec(np.ones(nd))          # smooth RHS
        hard = rng.random(nd)
        params = AMGParams(smoother="l1jacobi")
        batch = amg_solve_batched(a, np.stack([easy, hard]), params,
                                  rtol=1e-8, tol=0.0)
        ref_easy = amg_solve(a, easy, params, rtol=1e-8, tol=0.0,
                             hierarchy=batch[0].hierarchy)
        assert batch[0].niters == ref_easy.niters
        np.testing.assert_allclose(batch[0].x, ref_easy.x, rtol=1e-5,
                                   atol=1e-9)
        assert batch[1].converged and batch[1].niters >= batch[0].niters

    def test_x0_and_padding(self, rng):
        """Non-zero x0 + a bucket-padded classical hierarchy round-trip."""
        n = 10
        a = poisson_7pt(n)
        nd = a.nrows
        bs = rng.random((2, nd))
        x0 = rng.random((2, nd)) * 0.1
        batch = amg_solve_batched(a, bs, AMGParams(), x0=x0, rtol=1e-8,
                                  tol=0.0)
        for i, res in enumerate(batch):
            np.testing.assert_allclose(a.matvec(res.x), bs[i], rtol=1e-4,
                                       atol=1e-7)
