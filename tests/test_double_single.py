"""Double-single (two-f32) residual arithmetic (sparse/double_single.py).

Oracle: numpy longdouble (80-bit on x86) — ~1e-19 precision, three
decades below the ~2e-14 double-single target, so oracle error never
masks a regression.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from amg_ann_tpu.fem import poisson_7pt
from amg_ann_tpu.sparse.dia import from_csr_dia
from amg_ann_tpu.sparse.double_single import (dia_residual_ds,
                                              dia_residual_ds_ref, ds_add,
                                              ds_split, ds_split_dia,
                                              two_prod, two_sum)


@pytest.fixture
def rng():
    return np.random.default_rng(5)


class TestPrimitives:
    def test_two_sum_exact(self, rng):
        a = rng.standard_normal(4096).astype(np.float32)
        b = (rng.standard_normal(4096) * 1e-6).astype(np.float32)
        s, e = two_sum(jnp.asarray(a), jnp.asarray(b))
        s, e = np.asarray(s, np.float64), np.asarray(e, np.float64)
        np.testing.assert_array_equal(
            s + e, a.astype(np.float64) + b.astype(np.float64))

    def test_two_prod_exact(self, rng):
        a = rng.standard_normal(4096).astype(np.float32)
        b = rng.standard_normal(4096).astype(np.float32)
        p, e = two_prod(jnp.asarray(a), jnp.asarray(b))
        p, e = np.asarray(p, np.float64), np.asarray(e, np.float64)
        np.testing.assert_array_equal(
            p + e, a.astype(np.float64) * b.astype(np.float64))

    def test_ds_add_precision(self, rng):
        a = rng.standard_normal(4096)
        b = rng.standard_normal(4096) * 1e-3
        ah, al = ds_split(a)
        bh, bl = ds_split(b)
        hi, lo = ds_add(*map(jnp.asarray, (ah, al, bh, bl)))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        np.testing.assert_allclose(got, a + b, rtol=2e-14,
                                   atol=2e-14 * np.abs(a + b).max())

    def test_ds_split_near_exact(self, rng):
        # hi+lo represents x to ~2^-49 relative (lo is rounded once)
        x = rng.standard_normal(1000) * np.exp(rng.uniform(-20, 20, 1000))
        hi, lo = ds_split(x)
        np.testing.assert_allclose(
            hi.astype(np.float64) + lo.astype(np.float64), x,
            rtol=4e-15, atol=0)


def _residual_oracle(a, x, b):
    """b − A x in longdouble via CSR row expansion."""
    rows, cols, vals = a.row_expand()
    acc = np.zeros(a.nrows, dtype=np.longdouble)
    np.add.at(acc, rows,
              vals.astype(np.longdouble) * x.astype(np.longdouble)[cols])
    return b.astype(np.longdouble) - acc


class TestResidual:
    def _problem(self, rng, n=20):
        a = poisson_7pt(n)  # f64 CSR
        x = rng.standard_normal(n**3) * np.exp(rng.uniform(-6, 6, n**3))
        b = rng.standard_normal(n**3)
        return a, x, b

    def test_ref_matches_longdouble(self, rng):
        a, x, b = self._problem(rng)
        d64 = from_csr_dia(a, dtype=jnp.float64)
        a_hi, a_lo = ds_split_dia(d64)
        xh, xl = map(jnp.asarray, ds_split(x))
        bh, bl = map(jnp.asarray, ds_split(b))
        r_hi, r_lo = dia_residual_ds_ref(a_hi, a_lo, xh, xl, bh, bl)
        got = (np.asarray(r_hi, np.float64).astype(np.longdouble)
               + np.asarray(r_lo, np.float64).astype(np.longdouble))
        want = _residual_oracle(a, x, b)
        scale = float(np.abs(a.row_expand()[2]).max() * np.abs(x).max())
        err = float(np.abs(got - want).max()) / scale
        # double-single target ~2^-48 with a 7-tap accumulation
        assert err < 1e-13, err

    def test_pallas_interpret_matches_ref(self, rng):
        a, x, b = self._problem(rng, n=16)
        d64 = from_csr_dia(a, dtype=jnp.float64)
        a_hi, a_lo = ds_split_dia(d64)
        xh, xl = map(jnp.asarray, ds_split(x))
        bh, bl = map(jnp.asarray, ds_split(b))
        want_hi, want_lo = dia_residual_ds_ref(a_hi, a_lo, xh, xl, bh, bl)
        got_hi, got_lo = dia_residual_ds(a_hi, a_lo, xh, xl, bh, bl,
                                         interpret=True)
        w = (np.asarray(want_hi, np.float64)
             + np.asarray(want_lo, np.float64))
        g = np.asarray(got_hi, np.float64) + np.asarray(got_lo, np.float64)
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-12 * np.abs(w).max())

    def test_residual_small_after_good_solve(self, rng):
        """The use case: x close to A⁻¹b — the ds residual must resolve
        magnitudes ~1e-10·‖b‖ that plain f32 cannot."""
        a, _, _ = self._problem(rng, n=12)
        x_true = rng.standard_normal(12**3)
        b = a.astype(np.float64).matvec(x_true)
        x = x_true * (1 + 1e-9)        # residual ~1e-9 relative
        d64 = from_csr_dia(a, dtype=jnp.float64)
        a_hi, a_lo = ds_split_dia(d64)
        xh, xl = map(jnp.asarray, ds_split(x))
        bh, bl = map(jnp.asarray, ds_split(b))
        r_hi, r_lo = dia_residual_ds_ref(a_hi, a_lo, xh, xl, bh, bl)
        got = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
        want = np.asarray(
            _residual_oracle(a, x, b).astype(np.float64))
        denom = np.linalg.norm(b)
        assert abs(np.linalg.norm(got) - np.linalg.norm(want)) / denom \
            < 1e-12
        # plain f32 CANNOT do this (sanity check on the premise)
        from amg_ann_tpu.sparse.dia import dia_spmv

        r32 = jnp.asarray(b, jnp.float32) - dia_spmv(
            from_csr_dia(a, dtype=jnp.float32), jnp.asarray(x, jnp.float32))
        err32 = abs(float(jnp.linalg.norm(r32))
                    - np.linalg.norm(want)) / denom
        assert err32 > 10 * 1e-12


class TestIRSolveDS:
    def test_ds_matches_f64_on_jumping_coefficients(self, rng):
        """End-to-end: ir_solve with the ds outer residual converges to
        1e-8 on a jumping-coefficient diffusion operator, matching the
        f64 path's outer-iteration count (±1)."""
        from amg_ann_tpu.fem.structured import StructuredDiffusion
        from amg_ann_tpu.solvers.refine import ir_solve

        p = StructuredDiffusion(pattern_size=2, refinements=3, degree=1,
                                mode=2, epsv=rng.uniform(0, 6, 4))
        a, b, _ = p.build()
        n1 = p.n_nodes_1d
        r64 = ir_solve(a, b, rtol=1e-8, grid_shape=(n1, n1, n1),
                       residual_mode="f64")
        rds = ir_solve(a, b, rtol=1e-8, grid_shape=(n1, n1, n1),
                       residual_mode="ds")
        assert r64.converged and r64.true_res <= 1e-8
        assert rds.converged and rds.true_res <= 1e-8, rds.true_res
        assert abs(rds.outer_iters - r64.outer_iters) <= 1, \
            (rds.outer_iters, r64.outer_iters)
