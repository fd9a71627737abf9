"""Distributed execution on a virtual 8-device CPU mesh (the TPU-pod-slice
stand-in the reference never had — its MPI path hard-exits beyond 1 rank)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amg_ann_tpu.amg import AMGParams, setup
from amg_ann_tpu.dist import (
    make_mesh, replicate, shard_hierarchy, shard_solve, shard_vector,
    sharded_ell,
)
from amg_ann_tpu.fem import poisson_7pt
from amg_ann_tpu.solvers import amg_solve
from amg_ann_tpu.sparse import CSR, from_csr, spmv


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


class TestShardedSpMV:
    def test_matches_single_device(self, mesh, rng):
        a = rng.random((100, 100)) * (rng.random((100, 100)) < 0.1)
        csr = CSR.from_dense(a)
        x = rng.random(100)
        y_ref = a @ x
        a_sh = sharded_ell(from_csr(csr), mesh)
        # padded to a multiple of 8 rows
        assert a_sh.data.shape[0] == 104
        x_sh = shard_vector(x, mesh)
        y = np.asarray(jax.jit(spmv)(a_sh, x_sh))
        np.testing.assert_allclose(y[:100], y_ref, rtol=1e-12)
        np.testing.assert_allclose(y[100:], 0.0)

    def test_sharding_layout(self, mesh, rng):
        csr = CSR.from_dense(np.eye(64))
        a_sh = sharded_ell(from_csr(csr), mesh)
        shard_sizes = {s.data.shape[0] for s in a_sh.data.addressable_shards}
        assert shard_sizes == {8}  # 64 rows / 8 devices


class TestDistributedSolve:
    def test_poisson_matches_single_device(self, mesh):
        n = 16
        a = poisson_7pt(n)
        b = a.matvec(np.random.default_rng(0).random(n**3))
        h = setup(a, AMGParams())
        res_1 = amg_solve(a, b, hierarchy=h, rtol=1e-8, tol=0.0)
        res_8 = shard_solve(h, b, mesh=mesh, rtol=1e-8, tol=0.0)
        assert int(res_8.niters) == res_1.niters
        x8 = np.asarray(res_8.x)[: n**3]
        np.testing.assert_allclose(x8, res_1.x, rtol=1e-6, atol=1e-10)
        h1 = np.asarray(res_8.history)[: int(res_8.niters) + 1]
        np.testing.assert_allclose(h1, res_1.p_res, rtol=1e-6)

    def test_non_divisible_sizes(self, mesh):
        """15³ = 3375 rows, not divisible by 8 — padding must be exact."""
        n = 15
        a = poisson_7pt(n)
        b = np.ones(n**3)
        h = setup(a, AMGParams())
        res_8 = shard_solve(h, b, mesh=mesh, rtol=1e-8, tol=0.0)
        assert bool(res_8.converged)
        x = np.asarray(res_8.x)[: n**3]
        r = b - a.matvec(x)
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-6


class TestDataParallelTraining:
    def test_batch_sharded_train_step(self, mesh):
        """ANN train step with dp-sharded batch, replicated params."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from amg_ann_tpu.ann import ThetaCostModel, create_state
        from amg_ann_tpu.ann.train import make_train_step

        model = ThetaCostModel(nparams=3, wide1=4, depth1=1, wide2=0,
                               depth2=0, bottleneck=8, wide3=16, depth3=1)
        state = create_state(model, jax.random.PRNGKey(0), (12, 12, 4))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        step = make_train_step(model)

        rng = np.random.default_rng(0)
        batch = 32
        view = jax.device_put(
            rng.random((batch, 12, 12, 4)).astype(np.float32),
            NamedSharding(mesh, P("rows")))
        pvec = jax.device_put(rng.random((batch, 3)).astype(np.float32),
                              NamedSharding(mesh, P("rows")))
        tgt = jax.device_put(rng.random((batch, 1)).astype(np.float32),
                             NamedSharding(mesh, P("rows")))
        state2, loss, _ = step(state, view, pvec, tgt)
        assert np.isfinite(float(loss))
        # params remain replicated after the update
        leaf = jax.tree.leaves(state2.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestHaloExchange:
    def test_halo_spmv_matches(self, mesh):
        """shard_map + ppermute halo SpMV == host matvec."""
        from amg_ann_tpu.dist.halo import distribute_dia, dia_halo
        from amg_ann_tpu.sparse.dia import from_csr_dia

        n = 16
        a = poisson_7pt(n)
        d = from_csr_dia(a)
        assert dia_halo(d.offsets) == n * n
        fn, data_sh, put = distribute_dia(d, mesh)
        x = np.random.default_rng(0).random(n**3)
        y = np.asarray(fn(data_sh, put(x)))
        np.testing.assert_allclose(y[: n**3], a.matvec(x), rtol=1e-12)

    def test_local_spmv_overlap_split(self):
        """The interior+boundary-correction split == the concat oracle.

        The split exists so the interior product carries no data
        dependency on the ppermute outputs (exchange/compute overlap on
        TPU); this pins its algebra, including halo == nb and rows that
        take BOTH left and right contributions."""
        import jax.numpy as jnp
        from amg_ann_tpu.dist.halo import _local_spmv

        rng = np.random.default_rng(3)
        for nb, halo, offsets in [(64, 9, (-9, -3, -1, 0, 1, 3, 9)),
                                  (16, 16, (-16, -5, 0, 5, 16)),
                                  (32, 20, (-20, 0, 20))]:
            data = rng.standard_normal((len(offsets), nb))
            x = rng.standard_normal(nb)
            fl = rng.standard_normal(halo)
            fr = rng.standard_normal(halo)
            x_ext = np.concatenate([fl, x, fr])
            want = np.zeros(nb)
            for k, o in enumerate(offsets):
                want += data[k] * x_ext[halo + o: halo + o + nb]
            got = np.asarray(_local_spmv(
                jnp.asarray(data), jnp.asarray(x), jnp.asarray(fl),
                jnp.asarray(fr), offsets, halo, nb))
            np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_interior_independent_of_halo(self):
        """Structural overlap guarantee: zero halos ⇒ interior rows exact,
        and the jaxpr's big product chain consumes only x (checked by
        value: garbage halos must perturb ONLY the 2·halo boundary rows)."""
        import jax.numpy as jnp
        from amg_ann_tpu.dist.halo import _local_spmv

        rng = np.random.default_rng(4)
        nb, halo, offsets = (128, 8, (-8, -1, 0, 1, 8))
        data = jnp.asarray(rng.standard_normal((len(offsets), nb)))
        x = jnp.asarray(rng.standard_normal(nb))
        z = jnp.zeros(halo)
        g1, g2 = (jnp.asarray(rng.standard_normal(halo)) for _ in range(2))
        y0 = np.asarray(_local_spmv(data, x, z, z, offsets, halo, nb))
        y1 = np.asarray(_local_spmv(data, x, g1, g2, offsets, halo, nb))
        np.testing.assert_array_equal(y0[halo:nb - halo],
                                      y1[halo:nb - halo])
        assert np.any(y0[:halo] != y1[:halo])

    def test_halo_too_large_rejected(self, mesh):
        from amg_ann_tpu.dist.halo import halo_spmv_shardmap
        from amg_ann_tpu.sparse.dia import from_csr_dia

        a = poisson_7pt(8)   # 512 dofs over 8 devices: block 64 < halo 64?
        d = from_csr_dia(a)
        # halo = 64 == block 64 -> allowed; shrink by faking offsets
        import dataclasses

        big = d.replace(offsets=(-200, 0, 200))
        with pytest.raises(AssertionError):
            halo_spmv_shardmap(big, mesh)


class TestDistStructured:
    """Distributed structured V-cycle (dist/structured.py): whole AMG-PCG
    inside one shard_map with halo exchange in the cycle."""

    def _problem(self, n=16, theta=0.25):
        from amg_ann_tpu.amg.structured_mg import setup_structured
        from amg_ann_tpu.fem import (diffusion_7pt,
                                     jumping_coefficient_field)

        rng = np.random.default_rng(0)
        kappa = jumping_coefficient_field(n, 4, rng.uniform(0, 4, 64),
                                          mode=3)
        a = diffusion_7pt(kappa)
        b = a.matvec(rng.random(n ** 3))
        params = AMGParams(smoother="chebyshev", strong_threshold=theta)
        return a, b, params, setup_structured(a, (n, n, n), params)

    def test_matches_single_device(self, mesh):
        from amg_ann_tpu.dist.structured import (dist_structured_solve,
                                                 shardable_levels)

        a, b, params, h = self._problem()
        assert shardable_levels(h, 8) >= 1
        res = dist_structured_solve(h, b, mesh=mesh, rtol=1e-8, tol=0.0,
                                    maxiter=100)
        ref = amg_solve(a, b, params, hierarchy=h, rtol=1e-8, tol=0.0)
        assert int(res.niters) == ref.niters
        # the V-cycle preconditioner matches to machine precision; the CG
        # trajectory itself amplifies the psum-vs-flat summation-order
        # rounding difference geometrically over iterations, so the
        # history tolerance is loose at the tail
        np.testing.assert_allclose(np.asarray(res.x), ref.x, rtol=1e-10,
                                   atol=1e-13)
        k = ref.niters + 1
        np.testing.assert_allclose(np.asarray(res.history)[:k],
                                   ref.p_res[:k], rtol=1e-7)

    def test_solution_sharded_on_mesh(self, mesh):
        from amg_ann_tpu.dist.structured import dist_structured_solve

        a, b, params, h = self._problem()
        res = dist_structured_solve(h, b, mesh=mesh, rtol=1e-6, tol=0.0)
        shards = res.x.addressable_shards
        assert len(shards) == 8
        assert all(s.data.shape[0] == a.nrows // 8 for s in shards)

    def test_operands_placed_on_mesh(self, mesh):
        from amg_ann_tpu.dist.structured import shard_structured_hierarchy

        _, _, _, h = self._problem()
        dh = shard_structured_hierarchy(h, mesh)
        lev0 = dh.sharded[0]
        assert len(lev0.a.data.addressable_shards) == 8
        assert len(lev0.p_w_halo.addressable_shards) == 8
        assert len(lev0.inv_diag.addressable_shards) == 8

    def test_theta_sensitivity_preserved(self, mesh):
        from amg_ann_tpu.dist.structured import dist_structured_solve

        iters = {}
        for th in (0.05, 0.9):
            a, b, params, h = self._problem(theta=th)
            res = dist_structured_solve(h, b, mesh=mesh, rtol=1e-8,
                                        tol=0.0, maxiter=300)
            assert bool(res.converged)
            iters[th] = int(res.niters)
        assert iters[0.05] != iters[0.9]

    def test_scaling_report_is_sharded(self):
        """scaling_report must measure a genuinely distributed solve."""
        from amg_ann_tpu.dist.multihost import scaling_report

        rep = scaling_report(n=16, rtol=1e-6, n_devices=8)
        assert rep["devices"] == 8
        assert rep["converged"]
        assert rep["nnz_per_s_ndev"] > 0 and rep["nnz_per_s_1dev"] > 0
        assert 0.0 < rep["scaling_efficiency"]


class TestShardedSetup:
    """Sharded hierarchy SETUP (dist/setup_sharded.py, SURVEY §7.8):
    per-device setup memory via GSPMD x-slab sharding of the fine
    stencil."""

    def test_matches_single_device_and_stays_sharded(self):
        import jax
        from jax.sharding import Mesh

        from amg_ann_tpu.amg import AMGParams
        from amg_ann_tpu.amg.boxmg import csr_to_stencil
        from amg_ann_tpu.amg.structured_mg import setup_structured
        from amg_ann_tpu.dist.setup_sharded import setup_structured_sharded
        from amg_ann_tpu.fem import poisson_7pt
        from amg_ann_tpu.solvers import amg_solve

        n = 16
        a = poisson_7pt(n)
        s = csr_to_stencil(a, (n, n, n)).astype(np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=512)
        mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
        h_sh = setup_structured_sharded(s, (n, n, n), params, mesh)
        h_ref = setup_structured(a, (n, n, n), params, stencil=s,
                                 device_setup=True)
        # bit-compatible hierarchy
        for lv_s, lv_r in zip(h_sh.device.levels, h_ref.device.levels):
            np.testing.assert_array_equal(np.asarray(lv_s.a.data),
                                          np.asarray(lv_r.a.data))
        # the FINE level's operator memory is genuinely partitioned
        spec = h_sh.device.levels[0].a.data.sharding.spec
        assert "x" in tuple(spec), spec
        # and the hierarchy solves
        b = a.matvec(np.random.default_rng(0).random(n ** 3))
        r = amg_solve(a, b, params, hierarchy=h_sh, rtol=1e-6, tol=0.0)
        assert bool(r.converged)


class TestCommInstrumentation:
    """r4: the isolated-comm measurement (dist/multihost._time_collectives
    + dist/halo.COMM_LOG) behind bench/MULTIHOST_ANALYSIS.md."""

    def test_comm_log_records_collectives(self, mesh):
        from amg_ann_tpu.dist import halo as halo_mod
        from amg_ann_tpu.dist.structured import dist_structured_solve
        from amg_ann_tpu.dist.multihost import _bench_problem

        h, b, _ = _bench_problem(16)
        jax.clear_caches()
        halo_mod.COMM_LOG = log = []
        try:
            res = dist_structured_solve(h, b, mesh=mesh, rtol=0.0,
                                        tol=0.0, maxiter=1)
            jax.block_until_ready(res.x)
        finally:
            halo_mod.COMM_LOG = None
        assert len(log) > 0
        kinds = {k for k, _, _ in log}
        assert "ppermute" in kinds
        for _, shape, dt in log:
            assert all(isinstance(s, int) for s in shape)

    def test_time_collectives_positive(self, mesh):
        from amg_ann_tpu.dist.multihost import _time_collectives

        log = [("ppermute", (4, 4), "float32"),
               ("all_gather", (8,), "float32")]
        t = _time_collectives(mesh, log, iters=3, reps=1)
        assert t > 0.0
