"""WELL (windowed ELL) format + gather-free Pallas SpMV (sparse/well.py).

The TPU path for the reference's unstructured testcase 1 matrices
(reference: testcase1-diffusion-unstructured/src/main.cpp): correctness of
packing/round-trip, the Pallas kernel vs the XLA-gather reference (interpret
mode), RCM utilities, and the end-to-end classical hierarchy in WELL format
matching the ELL hierarchy's convergence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.solvers import amg_solve, ir_solve
from amg_ann_tpu.sparse import well
from amg_ann_tpu.sparse.csr import CSR


def _banded_random(n=3000, bw=150, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(n):
        nb = rng.integers(3, 12)
        c = np.clip(i + rng.integers(-bw, bw, nb), 0, n - 1)
        cset = sorted(set(c.tolist()) | {i})
        rows += [i] * len(cset)
        cols += cset
    return CSR.from_coo(rows, cols, rng.random(len(rows)), (n, n)), rng


class TestPacking:
    def test_round_trip(self):
        a, _ = _banded_random()
        w = well.from_csr(a, dtype=np.float32)
        a2 = well.to_csr(w)
        assert a2.nnz == a.nnz
        np.testing.assert_allclose(
            a2.to_dense(), a.to_dense().astype(np.float32), atol=1e-7)

    def test_shapes_static_metadata(self):
        a, _ = _banded_random(n=2500)
        w = well.from_csr(a, dtype=np.float32)
        assert w.padded_rows == 3 * well.BLOCK
        assert w.nrows == 2500
        assert w.data.shape == w.lcol.shape
        assert w.data.shape[1] % 8 == 0
        # every window fits x storage
        assert int(np.max(np.asarray(w.w0) + np.asarray(w.snum))) <= w.nseg
        assert int(np.max(np.asarray(w.snum))) <= w.s_max

    def test_window_clamp_widens_snum(self):
        # a block whose raw window starts past nseg - s_max must still
        # scan every column it owns after the clamp (round-4 ordering bug)
        a, rng = _banded_random(n=3000, bw=60)
        w = well.from_csr(a, dtype=np.float32)
        x = rng.random(3000).astype(np.float32)
        y = np.asarray(well.spmv_ref(w, x))[:3000]
        y_ref = a.matvec(x.astype(np.float64))
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)


class TestSpMV:
    def test_ref_matches_csr(self):
        a, rng = _banded_random()
        w = well.from_csr(a, dtype=np.float32)
        x = rng.random(a.nrows).astype(np.float32)
        y = np.asarray(well.spmv_ref(w, x))[: a.nrows]
        np.testing.assert_allclose(
            y, a.matvec(x.astype(np.float64)), rtol=1e-5, atol=1e-6)

    def test_pallas_interpret_matches_ref(self):
        a, rng = _banded_random(n=2048, bw=100, seed=1)
        w = well.from_csr(a, dtype=np.float32)
        x = rng.random(a.nrows).astype(np.float32)
        y_ref = np.asarray(well.spmv_ref(w, x))
        y_k = np.asarray(well._spmv_pallas(w, x, interpret=True))
        np.testing.assert_allclose(y_k, y_ref, rtol=1e-6, atol=1e-7)

    def test_rectangular(self):
        rng = np.random.default_rng(2)
        n, nc = 3000, 700
        pr, pc = [], []
        for i in range(n):
            base = int(i * nc / n)
            cs = np.clip(base + rng.integers(-3, 4, 3), 0, nc - 1)
            for c in sorted(set(cs.tolist())):
                pr.append(i)
                pc.append(c)
        p = CSR.from_coo(pr, pc, rng.random(len(pr)), (n, nc))
        w = well.from_csr(p, dtype=np.float32)
        xc = rng.random(nc).astype(np.float32)
        y_ref = p.matvec(xc.astype(np.float64))
        for y in (well.spmv_ref(w, xc),
                  well._spmv_pallas(w, xc, interpret=True)):
            np.testing.assert_allclose(
                np.asarray(y)[:n], y_ref, rtol=1e-5, atol=1e-6)

    def test_empty_rows_and_padding(self):
        # rows with no entries + nrows far from the block size
        a = CSR.from_coo([0, 5, 130], [3, 5, 120],
                         [1.0, 2.0, 3.0], (200, 200))
        w = well.from_csr(a, dtype=np.float32)
        x = np.arange(200, dtype=np.float32)
        y = np.asarray(well.spmv_ref(w, x))
        assert y.shape[0] == well.BLOCK
        np.testing.assert_allclose(y[:200], a.matvec(x), atol=1e-6)
        assert not y[200:].any()


class TestOrdering:
    def test_rcm_reduces_random_order_cost(self):
        a, rng = _banded_random(n=4000, bw=80, seed=3)
        # scramble: random symmetric permutation destroys the band
        scram = rng.permutation(4000)
        a_s = well.permute_sym(a, scram)
        cost_scrambled = well.window_cost(a_s)
        perm = well.rcm_perm(a_s)
        cost_rcm = well.window_cost(well.permute_sym(a_s, perm))
        assert cost_rcm < 0.6 * cost_scrambled
        assert well.best_perm(a_s) is not None
        # an already-banded matrix keeps its natural order
        assert well.best_perm(a) is None or \
            well.window_cost(well.permute_sym(a, well.best_perm(a))) \
            < well.window_cost(a)

    def test_permute_sym_matvec_equivariance(self):
        a, rng = _banded_random(n=1500, seed=4)
        perm = well.rcm_perm(a)
        ap = well.permute_sym(a, perm)
        x = rng.random(1500)
        np.testing.assert_allclose(
            ap.matvec(x[perm]), a.matvec(x)[perm], rtol=1e-12)


class TestHierarchy:
    def test_classical_solve_matches_ell(self):
        from amg_ann_tpu.fem import poisson_7pt

        a = poisson_7pt(16)
        b = a.matvec(np.random.default_rng(0).random(16 ** 3))
        r_ell = amg_solve(a, b, AMGParams(dtype=np.float32,
                                          device_format="ell"), tol=1e-5)
        r_well = amg_solve(a, b, AMGParams(dtype=np.float32,
                                           device_format="well"), tol=1e-5)
        assert r_well.converged
        assert abs(r_ell.niters - r_well.niters) <= 1
        np.testing.assert_allclose(r_well.x, r_ell.x, rtol=1e-3, atol=1e-5)

    def test_unstructured_ir_parity(self):
        from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion

        prob = UnstructuredDiffusion(mesh="Cube", refinements=2, seed=3,
                                     max_diffusion=3.0, degree=1)
        a, b, _ = prob.build()
        outs = {}
        for fmt in ("ell", "well"):
            res = ir_solve(a, b, AMGParams(dtype=np.float32,
                                           device_format=fmt), rtol=1e-8)
            assert res.converged, fmt
            outs[fmt] = res
        assert outs["well"].inner_iters == outs["ell"].inner_iters
        np.testing.assert_allclose(outs["well"].x, outs["ell"].x,
                                   rtol=1e-6, atol=1e-9)

    def test_perm_applied_and_inverted(self):
        # scrambled-order matrix: RCM engages, solution must come back in
        # the caller's ordering
        from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion

        prob = UnstructuredDiffusion(mesh="Cube", refinements=2, seed=1,
                                     max_diffusion=1.0, degree=1)
        a, b, _ = prob.build()
        rng = np.random.default_rng(5)
        scram = rng.permutation(a.nrows)
        a_s = well.permute_sym(a, scram)
        b_s = b[scram]
        res = ir_solve(a_s, b_s, AMGParams(dtype=np.float32,
                                           device_format="well"),
                       rtol=1e-8)
        assert res.converged
        if res.hierarchy.device.perm is not None:
            nd = res.hierarchy.device.perm.shape[0]
            assert nd % well.BLOCK == 0
        # x_s solves the scrambled system ⇒ unscramble matches direct solve
        res0 = ir_solve(a, b, AMGParams(dtype=np.float32,
                                        device_format="well"), rtol=1e-8)
        x_un = np.empty_like(res.x)
        x_un[scram] = res.x
        np.testing.assert_allclose(x_un, res0.x, rtol=1e-5, atol=1e-8)


class TestResidualDS:
    """Double-single (two-f32) outer residual on the WELL layout —
    the unstructured ir_solve outer (sparse/well.residual_ds)."""

    def _setup(self, n=3000, seed=11):
        a, rng = _banded_random(n=n, bw=120, seed=seed)
        import jax.numpy as jnp

        from amg_ann_tpu.sparse.double_single import ds_split

        x = rng.random(n)
        b = rng.random(n)
        wh, wl = well.from_csr_ds(a)
        xh, xl = ds_split(x)
        bh, bl = ds_split(b)
        args = tuple(jnp.asarray(v) for v in (xh, xl, bh, bl))
        r_exact = b - a.matvec(x)
        return a, wh, wl, args, r_exact

    def test_lo_part_nonzero(self):
        # regression: jnp.asarray silently downcasts f64 under x64-off,
        # which zeroed the lo split entirely (f32-level residuals)
        _, _, wl, _, _ = self._setup()
        assert float(np.abs(np.asarray(wl)).max()) > 0

    def test_ref_accuracy(self):
        a, wh, wl, args, r_exact = self._setup()
        rh, rl = well.residual_ds_ref(wh, wl, *args)
        got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
        scale = np.abs(r_exact).max() + 1.0
        assert np.abs(got - r_exact).max() / scale < 1e-12

    def test_kernel_interpret_accuracy(self):
        a, wh, wl, args, r_exact = self._setup(seed=12)
        rh, rl = well._residual_ds_pallas(wh, wl, *args, interpret=True)
        got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
        scale = np.abs(r_exact).max() + 1.0
        assert np.abs(got - r_exact).max() / scale < 1e-12

    def test_ir_solve_ds_mode_reaches_1em8(self):
        from amg_ann_tpu.fem.unstructured import UnstructuredDiffusion

        prob = UnstructuredDiffusion(mesh="Cube", refinements=2, seed=3,
                                     max_diffusion=3.0, degree=1)
        a, b, _ = prob.build()
        res = ir_solve(a, b, AMGParams(dtype=np.float32,
                                       device_format="well"),
                       rtol=1e-8, residual_mode="ds")
        assert res.converged and res.true_res < 1e-8


class TestFusedSmootherApply:
    """sparse/well.smooth_apply (single-launch whole application, r5)
    vs the generic op_smooth_apply recurrence, in interpret mode."""

    @staticmethod
    def _setup():
        from amg_ann_tpu.fem import poisson_7pt
        from amg_ann_tpu.sparse import well as wm

        a = poisson_7pt(14)
        perm = wm.best_perm(a)
        ap = wm.permute_sym(a, perm) if perm is not None else a
        w = wm.from_csr(ap, dtype=np.float32)
        rng = np.random.default_rng(0)
        npad = w.padded_rows
        x = np.zeros(npad, np.float32); x[:a.nrows] = rng.random(a.nrows)
        b = np.zeros(npad, np.float32); b[:a.nrows] = rng.random(a.nrows)
        s = np.zeros(npad, np.float32)
        s[:a.nrows] = 1.0 / ap.diagonal()
        coefs = np.array([[0.7, 0.0], [0.3, 0.5], [0.2, 0.4],
                          [0.0, 0.0]], np.float32)
        return w, x, b, s, coefs, npad

    @pytest.mark.parametrize("x_zero", [True, False])
    @pytest.mark.parametrize("want_res", [True, False])
    def test_matches_reference_recurrence(self, x_zero, want_res):
        from amg_ann_tpu.sparse import well as wm

        w, x, b, s, coefs, npad = self._setup()

        def ref():
            r = (jnp.asarray(b) if x_zero
                 else jnp.asarray(b) - wm.spmv_ref(w, jnp.asarray(x))[:npad])
            d = coefs[0, 0] * (s * r)
            xx = (jnp.zeros(npad, jnp.float32) if x_zero
                  else jnp.asarray(x))
            for j in range(1, coefs.shape[0]):
                t = wm.spmv_ref(w, d)[:npad]
                xx = xx + d
                r = r - t
                d = coefs[j, 0] * d + coefs[j, 1] * (s * r)
            if want_res:
                return xx + d, r - wm.spmv_ref(w, d)[:npad]
            return xx + d, None

        xo, ro = wm.smooth_apply(w, jnp.asarray(x), jnp.asarray(b),
                                 jnp.asarray(s), jnp.asarray(coefs),
                                 x_zero, want_res, interpret=True)
        xr, rr = ref()
        np.testing.assert_allclose(np.asarray(xo), np.asarray(xr),
                                   rtol=2e-5, atol=2e-5)
        if want_res:
            np.testing.assert_allclose(np.asarray(ro), np.asarray(rr),
                                       rtol=2e-5, atol=2e-4)
        else:
            assert ro is None
