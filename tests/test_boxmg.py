"""Operator-induced structured interpolation (θ-sensitive TPU fast path).

Oracles: CSR SpGEMM for the stencil-algebra RAP, explicit adjoint identity
for the weighted transfers, trilinear equivalence where PFMG uses
geometric weights, and θ-monotonicity of the iteration count on
jumping-coefficient diffusion (the property the whole dataset/ANN story
rests on — reference common/amg_solver.h:30).
"""

import numpy as np
import pytest
import jax.numpy as jnp


def jnp_zeros(n):
    return jnp.zeros(n)

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.amg.boxmg import (
    choose_strides, csr_to_stencil, dir_index, interp_csr, interp_weights,
    rap_stencil, stencil_diag_stats, stencil_to_csr, stencil_to_dia,
)
from amg_ann_tpu.amg.structured_mg import setup_structured
from amg_ann_tpu.amg.transfer import prolongate_w, restrict_w
from amg_ann_tpu.fem import (
    anisotropic_27pt, diffusion_7pt, jumping_coefficient_field, poisson_7pt,
)
from amg_ann_tpu.solvers import amg_solve
from amg_ann_tpu.sparse.dia import dia_spmv
from amg_ann_tpu.sparse.spgemm import spgemm


def _jump_operator(n=12, seed=0, span=6.0):
    rng = np.random.default_rng(seed)
    kappa = jumping_coefficient_field(n, 4, rng.uniform(0, span, 64), mode=3)
    return diffusion_7pt(kappa)


class TestStencilFormat:
    def test_csr_roundtrip(self):
        a = _jump_operator()
        s = csr_to_stencil(a, (12, 12, 12))
        assert s is not None
        np.testing.assert_allclose(stencil_to_csr(s).to_dense(),
                                   a.to_dense(), rtol=1e-14)

    def test_wide_stencil_rejected(self):
        from amg_ann_tpu.fem.structured import StructuredDiffusion

        p = StructuredDiffusion(pattern_size=2, refinements=2, degree=2)
        a, _, _ = p.build()
        n = p.n_nodes_1d
        assert csr_to_stencil(a, (n, n, n)) is None

    def test_dia_matches_csr(self, rng):
        a = _jump_operator()
        s = csr_to_stencil(a, (12, 12, 12))
        d = stencil_to_dia(s)
        x = rng.random(a.nrows)
        np.testing.assert_allclose(np.asarray(dia_spmv(d, x)), a.matvec(x),
                                   rtol=1e-12)


class TestInterpolation:
    def test_rap_matches_spgemm_two_levels(self):
        a = _jump_operator()
        s = csr_to_stencil(a, (12, 12, 12))
        for theta in (0.1, 0.5, 0.9):
            w = interp_weights(s, theta)
            p = interp_csr(w)
            ac = rap_stencil(s, w)
            oracle = spgemm(p.transpose(), spgemm(stencil_to_csr(s), p))
            got = stencil_to_csr(ac).to_dense()
            np.testing.assert_allclose(got, oracle.to_dense(), atol=1e-12)
            # level 2 (27-point fine operator, positive entries present)
            w2 = interp_weights(ac, theta)
            p2 = interp_csr(w2)
            ac2 = rap_stencil(ac, w2)
            oracle2 = spgemm(p2.transpose(), spgemm(stencil_to_csr(ac), p2))
            scale = np.abs(oracle2.to_dense()).max()
            np.testing.assert_allclose(stencil_to_csr(ac2).to_dense(),
                                       oracle2.to_dense(), atol=1e-12 * scale)

    def test_rap_semicoarsening_matches_spgemm(self):
        a = anisotropic_27pt(8)
        s = csr_to_stencil(a, (8, 8, 8))
        strides = choose_strides(s, 0.9)
        assert strides != (2, 2, 2), "anisotropy must trigger semicoarsening"
        w = interp_weights(s, 0.9, strides=strides)
        p = interp_csr(w, strides)
        ac = rap_stencil(s, w, strides)
        oracle = spgemm(p.transpose(), spgemm(a, p))
        np.testing.assert_allclose(stencil_to_csr(ac).to_dense(),
                                   oracle.to_dense(), atol=1e-12)

    def test_isotropic_always_full_coarsening(self):
        s = csr_to_stencil(poisson_7pt(8), (8, 8, 8))
        for theta in (0.05, 0.5, 0.99):
            assert choose_strides(s, theta) == (2, 2, 2)

    def test_trilinear_where_uncoupled(self):
        """7-point fine operator: coarse-cell interior points have no
        operator coupling to the coarse lattice → PFMG geometric weights."""
        s = csr_to_stencil(poisson_7pt(8), (8, 8, 8))
        w = interp_weights(s, 0.25)
        # (2,2,2): all-even point, 8 corner neighbors at weight 1/8
        for d in ((1, 1, 1), (-1, 1, 1), (-1, -1, -1)):
            assert w[dir_index(d)][2, 2, 2] == pytest.approx(0.125)
        # C point identity
        assert w[dir_index((0, 0, 0))][1, 3, 5] == 1.0

    def test_rowsum_preservation(self):
        """Interpolation reproduces constants where the fine operator has
        zero row sum (interior rows of the Galerkin level-1 operator)."""
        a = _jump_operator()
        s = csr_to_stencil(a, (12, 12, 12))
        s1 = rap_stencil(s, interp_weights(s, 0.25))
        w1 = interp_weights(s1, 0.25)
        rowsum_a = s1.sum(axis=0)
        wsum = w1.sum(axis=0)
        interior = np.abs(rowsum_a) < 1e-10 * np.abs(s1[13])
        # interpolating interior rows sum to 1 (zero rows are the
        # deliberate smoother-only F points of the strict θ policy)
        interp_rows = interior & (wsum != 0)
        assert interp_rows.sum() > 0
        assert np.all(np.abs(wsum[interp_rows] - 1.0) < 1e-8)

    def test_theta_changes_weights(self):
        a = _jump_operator(seed=3)
        s = csr_to_stencil(a, (12, 12, 12))
        s1 = rap_stencil(s, interp_weights(s, 0.25))
        w_lo = interp_weights(s1, 0.05)
        w_hi = interp_weights(s1, 0.9)
        assert np.abs(w_lo - w_hi).max() > 1e-3


class TestWeightedTransfers:
    def test_adjoint_and_csr_equivalence(self, rng):
        a = _jump_operator(n=10, seed=1)
        s = csr_to_stencil(a, (10, 10, 10))
        w = interp_weights(s, 0.4)
        p = interp_csr(w)
        c = rng.random(p.ncols)
        f = rng.random(p.nrows)
        pf = np.asarray(prolongate_w(c, w, (10, 10, 10)))
        np.testing.assert_allclose(pf, p.matvec(c), rtol=1e-12, atol=1e-14)
        lhs = pf @ f
        rhs = c @ np.asarray(restrict_w(f, w, (10, 10, 10)))
        assert lhs == pytest.approx(rhs, rel=1e-12)

    def test_adjoint_semicoarsened(self, rng):
        a = anisotropic_27pt(8)
        s = csr_to_stencil(a, (8, 8, 8))
        strides = choose_strides(s, 0.9)
        w = interp_weights(s, 0.9, strides=strides)
        p = interp_csr(w, strides)
        c = rng.random(p.ncols)
        f = rng.random(p.nrows)
        pf = np.asarray(prolongate_w(c, w, (8, 8, 8), strides))
        np.testing.assert_allclose(pf, p.matvec(c), rtol=1e-12, atol=1e-14)
        lhs = pf @ f
        rhs = c @ np.asarray(restrict_w(f, w, (8, 8, 8), strides))
        assert lhs == pytest.approx(rhs, rel=1e-12)


class TestThetaSensitivity:
    def test_niters_monotone_on_jumps(self):
        """Iteration count must genuinely respond to θ — the signal the
        dataset/ANN pipeline trains on."""
        n = 16
        rng = np.random.default_rng(7)
        kappa = jumping_coefficient_field(n, 4, rng.uniform(0, 6, 64), mode=3)
        a = diffusion_7pt(kappa)
        b = a.matvec(rng.random(n**3))
        iters = {}
        for th in (0.05, 0.5, 0.9):
            r = amg_solve(a, b, AMGParams(smoother="chebyshev",
                                          strong_threshold=th),
                          grid_shape=(n, n, n), rtol=1e-8, tol=0.0,
                          maxiter=300)
            assert r.converged
            iters[th] = r.niters
        assert iters[0.05] < iters[0.9], iters

    def test_solver_stats_hierarchy_shapes_theta_independent(self):
        """Geometric coarsening ⇒ one compiled solve per grid size across a
        θ-sweep (isotropic problems; the property TPU datagen relies on)."""
        a = _jump_operator(n=8, seed=2)
        shapes = set()
        for th in (0.1, 0.5, 0.9):
            h = setup_structured(a, (8, 8, 8),
                                 AMGParams(strong_threshold=th))
            shapes.add(tuple((lev.shape, lev.a.offsets)
                             for lev in h.device.levels))
        assert len(shapes) == 1

    def test_semicoarsening_helps_anisotropy(self):
        n = 16
        a = anisotropic_27pt(n)
        b = a.matvec(np.random.default_rng(0).random(n**3))
        res = {}
        for th in (0.02, 0.9):
            r = amg_solve(a, b, AMGParams(smoother="chebyshev",
                                          strong_threshold=th),
                          grid_shape=(n, n, n), rtol=1e-8, tol=0.0,
                          maxiter=500)
            assert r.converged
            res[th] = r.niters
        assert res[0.9] < res[0.02], res


class TestDiagStats:
    def test_matches_csr(self):
        a = _jump_operator()
        s = csr_to_stencil(a, (12, 12, 12))
        inv_d, inv_l1, lam = stencil_diag_stats(s)
        np.testing.assert_allclose(inv_d, 1.0 / a.diagonal(), rtol=1e-13)
        rows, _, vals = a.row_expand()
        l1 = np.bincount(rows, weights=np.abs(vals), minlength=a.nrows)
        np.testing.assert_allclose(inv_l1, 1.0 / l1, rtol=1e-13)
        assert lam > 0


class TestFusedSmoother:
    def test_smooth_rx_matches_reference_chebyshev(self, rng):
        """The residual-carrying fused recurrence must reproduce the plain
        three-term Chebyshev smoother exactly (same operator)."""
        from amg_ann_tpu.amg.structured_mg import setup_structured
        from amg_ann_tpu.solvers.smoothers import chebyshev, smooth_rx

        a = poisson_7pt(8)
        h = setup_structured(a, (8, 8, 8), AMGParams(smoother="chebyshev"))
        lev = h.device.levels[0]
        b = rng.random(a.nrows)
        x0 = rng.random(a.nrows)
        params = h.params
        ref = np.asarray(chebyshev(lev, x0, b, degree=params.cheb_degree))
        got, r_out = smooth_rx(lev, x0, b, params, want_residual=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(r_out),
                                   b - a.matvec(np.asarray(got)),
                                   rtol=1e-10, atol=1e-12)

    def test_smooth_rx_residual_seed(self, rng):
        """Passing the known residual must not change the smoother output."""
        from amg_ann_tpu.amg.structured_mg import setup_structured
        from amg_ann_tpu.solvers.smoothers import smooth_rx

        a = poisson_7pt(8)
        for sm in ("jacobi", "l1jacobi", "chebyshev"):
            h = setup_structured(a, (8, 8, 8), AMGParams(smoother=sm))
            lev = h.device.levels[0]
            b = rng.random(a.nrows)
            x1, _ = smooth_rx(lev, jnp_zeros(a.nrows), b, h.params)
            x2, _ = smooth_rx(lev, jnp_zeros(a.nrows), b, h.params, r=b)
            np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                       rtol=1e-12)

    def test_fused_kernel_interpret_matches(self, rng):
        """dia_smooth_step_fast (Pallas path, interpret-equivalent jnp
        fallback) equals the unfused arithmetic."""
        from amg_ann_tpu.sparse.dia import (
            dia_smooth_step_fast, dia_spmv, from_csr_dia,
        )

        a = poisson_7pt(8, dtype=np.float32)
        dm = from_csr_dia(a)
        n = a.nrows
        x, r, d, s = (rng.random(n).astype(np.float32) for _ in range(4))
        c_a, c_b = 0.3, 0.7
        xo, ro, do = dia_smooth_step_fast(dm, x, r, d, s, c_a, c_b,
                                          interpret=True)
        t = np.asarray(dia_spmv(dm, d))
        np.testing.assert_allclose(np.asarray(xo), x + d, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ro), r - t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(do),
                                   c_a * d + c_b * (s * (r - t)),
                                   rtol=1e-5, atol=1e-6)

    def test_cheb_sweep_kernel_interpret_matches(self, rng):
        """dia_cheb_sweep (one launch for a whole multi-step sweep,
        overlapping-halo temporal tiling) equals the per-step loop —
        incl. edge-block window clamping and row padding (n ≠ R·128)."""
        import jax.numpy as jnp

        from amg_ann_tpu.sparse.dia import (
            dia_spmv, from_csr_dia,
        )
        from amg_ann_tpu.sparse.pallas_spmv import dia_cheb_sweep_pallas

        for n1d in (16, 20):          # 20³=8000: exercises padded rows
            a = poisson_7pt(n1d, dtype=np.float32)
            dm = from_csr_dia(a)
            n = a.nrows
            x, r, d, s = (rng.random(n).astype(np.float32)
                          for _ in range(4))
            coefs = np.array([[0.3, 0.7], [0.5, 0.2], [0.0, 0.0]],
                             dtype=np.float32)
            # oracle: unfused per-step recurrence
            xe, re, de = x.copy(), r.copy(), d.copy()
            for ca, cb in coefs:
                t = np.asarray(dia_spmv(dm, de))
                xe, re = xe + de, re - t
                de = ca * de + cb * (s * re)

            rr = dm.data.shape[1]
            rc = rr * 128
            pad = lambda v: np.pad(v, (0, rc - n)).reshape(rr, 128)
            # small block forces several programs incl. clamped edges
            h = 2                     # halo for the ±n1d² taps at n≤20
            bs = 8
            assert bs + 2 * 3 * h <= rr
            xo, ro, do = dia_cheb_sweep_pallas(
                dm.data, jnp.asarray(pad(x)), jnp.asarray(pad(r)),
                jnp.asarray(pad(d)), jnp.asarray(pad(s)),
                jnp.asarray(coefs), dm.offsets, 3, block_rows=bs,
                interpret=True)
            for got, exp in ((xo, xe), (ro, re), (do, de)):
                np.testing.assert_allclose(
                    np.asarray(got).reshape(-1)[:n], exp,
                    rtol=2e-5, atol=2e-5)

    def test_cheb_sweep_fast_wrapper(self, rng):
        """dia_cheb_sweep_fast (interpret) == its own fallback loop."""
        from amg_ann_tpu.sparse.dia import (
            dia_cheb_sweep_fast, from_csr_dia,
        )

        a = poisson_7pt(16, dtype=np.float32)
        dm = from_csr_dia(a)
        n = a.nrows
        x, r, d, s = (rng.random(n).astype(np.float32) for _ in range(4))
        coefs = np.array([[0.4, 0.6], [0.0, 0.0]], dtype=np.float32)
        got = dia_cheb_sweep_fast(dm, x, r, d, s, np.asarray(coefs),
                                  interpret=True)
        # force the fallback with a 1-row-block impossibility: off-TPU
        # without interpret the wrapper loops per step
        exp = dia_cheb_sweep_fast(dm, x, r, d, s, np.asarray(coefs),
                                  interpret=False)
        for g, e in zip(got, exp):
            np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                       rtol=2e-5, atol=2e-5)


class TestDeviceSetup:
    """amg/boxmg_device.py — the jitted setup must reproduce the host
    oracle exactly (weights, coarse stencils, stats) and solve identically."""

    def test_matches_host_oracle(self):
        from amg_ann_tpu.amg.structured_mg import setup_structured

        a = _jump_operator(n=16, seed=0, span=4.0)
        for th in (0.25, 0.9):
            params = AMGParams(smoother="chebyshev", strong_threshold=th)
            hh = setup_structured(a, (16, 16, 16), params,
                                  device_setup=False)
            hd = setup_structured(a, (16, 16, 16), params,
                                  device_setup=True)
            assert hh.stats.nnz == hd.stats.nnz
            assert hh.strides == hd.strides
            for sh, sd in zip(hh.stencils, hd.stencils):
                scale = max(np.abs(sh).max(), 1e-30)
                assert np.abs(np.asarray(sd) - sh).max() < 1e-12 * scale
            for wh, wd in zip(hh.weights, hd.weights):
                assert np.abs(np.asarray(wd) - wh).max() < 1e-12

    def test_solve_with_device_hierarchy(self):
        from amg_ann_tpu.amg.structured_mg import setup_structured

        a = _jump_operator(n=16, seed=2, span=4.0)
        b = a.matvec(np.random.default_rng(0).random(a.nrows))
        params = AMGParams(smoother="chebyshev")
        hd = setup_structured(a, (16, 16, 16), params, device_setup=True)
        hh = setup_structured(a, (16, 16, 16), params, device_setup=False)
        rd = amg_solve(a, b, params, hierarchy=hd, rtol=1e-8, tol=0.0)
        rh = amg_solve(a, b, params, hierarchy=hh, rtol=1e-8, tol=0.0)
        assert rd.converged and rd.niters == rh.niters

    def test_semicoarsening_through_device_path(self):
        from amg_ann_tpu.amg.structured_mg import setup_structured

        a = anisotropic_27pt(16)
        params = AMGParams(smoother="chebyshev", strong_threshold=0.9)
        hd = setup_structured(a, (16, 16, 16), params, device_setup=True)
        assert any(st != (2, 2, 2) for st in hd.strides)


class TestDIATransfers:
    """DIA-form transfers (amg/transfer.transfer_dia): the pad/slice
    transfer chains recast as masked banded operators so P/R each run as
    one Pallas launch on TPU (solvers/cycle._dia_transfers)."""

    def test_transfer_dia_matches_oracles(self, rng):
        from amg_ann_tpu.amg.transfer import (coarse_size, interleave_flat,
                                              subsample_flat, transfer_dia)

        for shape, strides in [((8, 8, 8), (2, 2, 2)),
                               ((7, 5, 6), (2, 2, 2)),
                               ((9, 6, 8), (1, 2, 2)),
                               ((6, 7, 5), (2, 1, 2))]:
            nx, ny, nz = shape
            n = nx * ny * nz
            cs = tuple(coarse_size(s) if st == 2 else s
                       for s, st in zip(shape, strides))
            m = int(np.prod(cs))
            w = jnp.asarray(
                rng.standard_normal((27, nx, ny, nz)).astype(np.float32))
            c = jnp.asarray(rng.standard_normal(m).astype(np.float32))
            f = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            p_dia, r_dia = transfer_dia(w, shape, strides)
            np.testing.assert_allclose(
                np.asarray(dia_spmv(p_dia,
                                    interleave_flat(c, shape, strides))),
                np.asarray(prolongate_w(c, w, shape, strides)),
                rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(subsample_flat(dia_spmv(r_dia, f),
                                          shape, strides)),
                np.asarray(restrict_w(f, w, shape, strides)),
                rtol=2e-5, atol=2e-5)

    def test_solve_parity_with_dia_transfers(self, monkeypatch):
        """Whole AMG-PCG solve is unchanged when the V-cycle routes its
        transfers through the DIA operands (jnp path on CPU)."""
        from amg_ann_tpu.amg import structured_mg
        from amg_ann_tpu.solvers import cycle

        a = _jump_operator(n=12, seed=3)
        b = a.matvec(np.random.default_rng(1).random(12**3))
        params = AMGParams(smoother="chebyshev", strong_threshold=0.3)
        ref = amg_solve(a, b, params, grid_shape=(12, 12, 12),
                        rtol=1e-8, tol=0.0, maxiter=300)

        monkeypatch.setattr(structured_mg, "_want_transfer_dia",
                            lambda shape: True)
        monkeypatch.setattr(cycle, "TRANSFER_DIA_MODE", "always")
        got = amg_solve(a, b, params, grid_shape=(12, 12, 12),
                        rtol=1e-8, tol=0.0, maxiter=300)
        assert got.converged and ref.converged
        assert abs(got.niters - ref.niters) <= 1, (got.niters, ref.niters)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=1e-4, atol=1e-5)


class TestCoarseLevelKernelGeometry:
    """Stage-A shapes: with PALLAS_MIN_ROWS=2048 the 27-offset GALERKIN
    levels (halo 3 at 16³, halo 9 at 32³) run the fused kernels — pin the
    sweep window contract at exactly those geometries in interpret mode."""

    def _sweep_check(self, a_csr, rng, steps=3):
        import jax.numpy as jnp

        from amg_ann_tpu.sparse.dia import dia_spmv, from_csr_dia
        from amg_ann_tpu.sparse.pallas_spmv import (dia_cheb_sweep_pallas,
                                                    halo_rows)

        dm = from_csr_dia(a_csr, dtype=np.float32)
        n = a_csr.nrows
        x, r, d, s = (rng.standard_normal(n).astype(np.float32)
                      for _ in range(4))
        coefs = np.array([[0.3, 0.7], [0.5, 0.2], [0.0, 0.0]],
                         dtype=np.float32)[:steps]
        xe, re, de = x.copy(), r.copy(), d.copy()
        for ca, cb in coefs:
            t = np.asarray(dia_spmv(dm, de))
            xe, re = xe + de, re - t
            de = ca * de + cb * (s * re)
        rr = dm.data.shape[1]
        h = halo_rows(dm.offsets)
        assert 8 + 2 * steps * h <= rr, (rr, h)   # the dispatch gate
        rc = rr * 128
        pad = lambda v: np.pad(v, (0, rc - n)).reshape(rr, 128)
        xo, ro, do = dia_cheb_sweep_pallas(
            dm.data, jnp.asarray(pad(x)), jnp.asarray(pad(r)),
            jnp.asarray(pad(d)), jnp.asarray(pad(s)),
            jnp.asarray(coefs), dm.offsets, steps, interpret=True)
        for got, exp in ((xo, xe), (ro, re), (do, de)):
            np.testing.assert_allclose(np.asarray(got).reshape(-1)[:n],
                                       exp, rtol=3e-4, atol=3e-4)

    def test_27pt_16cubed(self, rng):
        # L2 geometry at a 64³ solve: R=32 rows, halo 3
        self._sweep_check(anisotropic_27pt(16), rng)

    def test_27pt_15cubed_galerkin_like(self, rng):
        # odd-size coarse grid (semicoarsened chains produce these);
        # 15³ = 3375 is the smallest odd 27-pt size above the 2048-dof
        # Pallas floor whose sweep window still fits (R=32, halo 3)
        self._sweep_check(anisotropic_27pt(15), rng)

    def test_device_setup_anisotropic_rebuild(self):
        """θ-driven semicoarsening makes the speculative full-coarsening
        pass WRONG — the device setup must detect it from the fetched
        couplings and rebuild with per-level decisions (host parity)."""
        from amg_ann_tpu.amg.structured_mg import setup_structured

        a = anisotropic_27pt(12)
        params = AMGParams(smoother="chebyshev", strong_threshold=0.9)
        hh = setup_structured(a, (12, 12, 12), params, device_setup=False)
        hd = setup_structured(a, (12, 12, 12), params, device_setup=True)
        assert 1 in [st for s in hh.strides for st in s], hh.strides
        assert hh.strides == hd.strides
        assert hh.stats.nnz == hd.stats.nnz
        for sh, sd in zip(hh.stencils, hd.stencils):
            scale = max(np.abs(sh).max(), 1e-30)
            assert np.abs(np.asarray(sd) - sh).max() < 1e-10 * scale


class TestBoxMGInterp:
    """θ-filtered BoxMG collapsed interpolation (interp_weights_boxmg)."""

    def _stencil(self, n=10):
        from amg_ann_tpu.fem import poisson_7pt

        a = poisson_7pt(n)
        return csr_to_stencil(a, (n, n, n)).astype(np.float64)

    def test_constants_preserved_interior(self):
        """Zero-row-sum rows must interpolate constants exactly: the
        weights of every F point sum to 1 where the row sum is 0."""
        s = self._stencil(12)
        # interior rows have zero row sum only for scale_h=False; build one
        from amg_ann_tpu.fem import poisson_7pt

        a = poisson_7pt(12, scale_h=False)
        s = csr_to_stencil(a, (12, 12, 12)).astype(np.float64)
        from amg_ann_tpu.amg.boxmg import interp_weights_boxmg

        w = interp_weights_boxmg(s, 0.25)
        wsum = w.sum(axis=0)
        # DEEP interior only: near the boundary the substituted
        # neighbors legitimately see the eliminated Dirichlet values and
        # the sums drop below 1 (correct harmonic-extension behavior)
        deep = np.zeros((12, 12, 12), bool)
        deep[3:-3, 3:-3, 3:-3] = True
        np.testing.assert_allclose(wsum[deep], 1.0, atol=1e-12)

    def test_galerkin_spd_and_convergence_level_independent(self):
        """RAP through the BoxMG weights stays SPD and the 2-level ρ is
        small (the level-independence evidence lives in bench history)."""
        from amg_ann_tpu.amg.boxmg import interp_weights_boxmg

        s = self._stencil(12)
        w = interp_weights_boxmg(s, 0.25)
        sc = rap_stencil(s, w)
        ac = stencil_to_csr(sc).to_dense()
        np.testing.assert_allclose(ac, ac.T, atol=1e-12)
        ev = np.linalg.eigvalsh(ac)
        assert ev.min() > 0

    def test_host_device_parity(self):
        from amg_ann_tpu.amg.boxmg import interp_weights_boxmg
        from amg_ann_tpu.amg.boxmg_device import interp_weights_boxmg_dev

        rng = np.random.default_rng(5)
        for strides in ((2, 2, 2), (2, 1, 2), (2, 1, 1)):
            s = self._stencil(8).astype(np.float32)
            # jumping-coefficient-like perturbation, symmetric enough
            s = s * (1.0 + 0.5 * rng.random(s.shape).astype(np.float32))
            for theta in (0.05, 0.5, 0.9):
                wh = interp_weights_boxmg(s, theta, strides=strides)
                wd = np.asarray(interp_weights_boxmg_dev(
                    jnp.asarray(s), theta, strides=strides))
                np.testing.assert_allclose(wd, wh, rtol=2e-6, atol=1e-7)

    def test_weights_on_corner_lattice_only(self):
        """Weights must live on the geometric coarse-corner set (the
        3³ closure the DIA V-cycle depends on)."""
        from amg_ann_tpu.amg.boxmg import _geo_masks, interp_weights_boxmg

        s = self._stencil(9)
        w = interp_weights_boxmg(s, 0.25)
        geo = _geo_masks((9, 9, 9), (2, 2, 2))
        c_mask = np.zeros((9, 9, 9), bool)
        odd = (np.arange(9) % 2) == 1
        c_mask = odd[:, None, None] & odd[None, :, None] & odd[None, None, :]
        off_lattice = (~geo) & ~((np.arange(27) == 13)[:, None, None, None]
                                 & c_mask[None])
        assert np.abs(np.where(off_lattice, w, 0.0)).max() == 0.0


class TestRAPParityMajor:
    """The parity-major RAP relayout (boxmg_device._rap_pm_layout) is
    gated at 200k points, so the normal CPU suite only exercises the
    legacy slicing path. Force the gate to 1 and pin equivalence
    (ADVICE r4: odd shapes, mixed strides, w_left)."""

    @staticmethod
    def _rand(shape, seed):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((27,) + shape).astype(np.float32)

    @pytest.mark.parametrize("shape,strides", [
        ((8, 8, 8), (2, 2, 2)),
        ((9, 10, 11), (2, 2, 2)),     # odd + mixed-parity extents
        ((8, 9, 8), (2, 1, 2)),       # semicoarsened middle axis
        ((7, 8, 9), (1, 2, 2)),
    ])
    def test_matches_direct_path(self, monkeypatch, shape, strides):
        from amg_ann_tpu.amg import boxmg_device as bd

        s = jnp.asarray(self._rand(shape, 0))
        w = jnp.asarray(self._rand(shape, 1))
        raw = bd.rap_stencil_dev.__wrapped__   # unjitted: no cache reuse
        monkeypatch.setattr(bd, "_RAP_PARITY_MAJOR_MIN", 10**12)
        direct = np.asarray(raw(s, w, strides=strides))
        monkeypatch.setattr(bd, "_RAP_PARITY_MAJOR_MIN", 1)
        pm = np.asarray(raw(s, w, strides=strides))
        np.testing.assert_allclose(pm, direct, rtol=1e-6, atol=1e-6)

    def test_matches_direct_path_w_left(self, monkeypatch):
        from amg_ann_tpu.amg import boxmg_device as bd

        shape, strides = (9, 8, 10), (2, 2, 2)
        s = jnp.asarray(self._rand(shape, 2))
        w = jnp.asarray(self._rand(shape, 3))
        wl = jnp.asarray(self._rand(shape, 4))
        slots = tuple(range(0, 27, 2))        # sparse a_slots too
        raw = bd.rap_stencil_dev.__wrapped__
        monkeypatch.setattr(bd, "_RAP_PARITY_MAJOR_MIN", 10**12)
        direct = np.asarray(raw(s, w, strides=strides, a_slots=slots,
                                w_left=wl))
        monkeypatch.setattr(bd, "_RAP_PARITY_MAJOR_MIN", 1)
        pm = np.asarray(raw(s, w, strides=strides, a_slots=slots,
                            w_left=wl))
        np.testing.assert_allclose(pm, direct, rtol=1e-6, atol=1e-6)
