"""Sparse layer: CSR host ops, SpGEMM (native + scipy), ELL device SpMV."""

import numpy as np
import jax.numpy as jnp
import pytest

from amg_ann_tpu.sparse import (
    CSR, diag, from_csr, l1_row_norm, spgemm, spmv, spmv_t, to_csr,
)
from amg_ann_tpu.sparse.spgemm import spgemm_native, spgemm_scipy


def random_csr(rng, m, n, density=0.1):
    a = rng.random((m, n)) * (rng.random((m, n)) < density)
    return a, CSR.from_dense(a)


class TestCSR:
    def test_from_dense_roundtrip(self, rng):
        a, csr = random_csr(rng, 17, 23)
        np.testing.assert_allclose(csr.to_dense(), a)

    def test_from_coo_sums_duplicates(self):
        c = CSR.from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], (2, 2))
        np.testing.assert_allclose(
            c.to_dense(), np.array([[0.0, 5.0], [4.0, 0.0]])
        )
        assert c.nnz == 2

    def test_matvec(self, rng):
        a, csr = random_csr(rng, 31, 19)
        x = rng.random(19)
        np.testing.assert_allclose(csr.matvec(x), a @ x)

    def test_transpose(self, rng):
        a, csr = random_csr(rng, 13, 29)
        np.testing.assert_allclose(csr.transpose().to_dense(), a.T)

    def test_diagonal(self, rng):
        a, csr = random_csr(rng, 21, 21, density=0.3)
        np.testing.assert_allclose(csr.diagonal(), np.diag(a))

    def test_extract(self, rng):
        a, csr = random_csr(rng, 20, 20, density=0.4)
        rm = rng.random(20) < 0.5
        cm = rng.random(20) < 0.5
        sub = csr.extract(rm, cm)
        np.testing.assert_allclose(sub.to_dense(), a[rm][:, cm])

    def test_scale_rows(self, rng):
        a, csr = random_csr(rng, 11, 7)
        s = rng.random(11)
        np.testing.assert_allclose(csr.scale_rows(s).to_dense(), s[:, None] * a)


class TestSpGEMM:
    @pytest.mark.parametrize("impl", [spgemm_native, spgemm_scipy, spgemm])
    def test_matches_dense(self, rng, impl):
        a, ca = random_csr(rng, 15, 22, 0.2)
        b, cb = random_csr(rng, 22, 9, 0.2)
        c = impl(ca, cb)
        assert c is not None, "native lib failed to build"
        np.testing.assert_allclose(c.to_dense(), a @ b, atol=1e-13)
        # per-row sorted columns
        for i in range(c.nrows):
            row = c.indices[c.indptr[i]:c.indptr[i + 1]]
            assert np.all(np.diff(row) > 0)

    def test_empty_rows(self):
        a = CSR.from_coo([0], [0], [1.0], (3, 3))
        b = CSR.from_coo([2], [1], [2.0], (3, 3))
        c = spgemm(a, b)
        np.testing.assert_allclose(c.to_dense(), np.zeros((3, 3)))


class TestELL:
    def test_roundtrip(self, rng):
        a, csr = random_csr(rng, 18, 18, 0.2)
        ell = from_csr(csr)
        np.testing.assert_allclose(to_csr(ell).to_dense(), a)

    def test_spmv(self, rng):
        a, csr = random_csr(rng, 33, 27, 0.2)
        x = rng.random(27)
        y = spmv(from_csr(csr), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), a @ x, rtol=1e-12)

    def test_spmv_alignment_padding(self, rng):
        a, csr = random_csr(rng, 30, 30, 0.2)
        x = rng.random(30)
        ell = from_csr(csr, k_align=8, row_align=16)
        assert ell.data.shape[0] == 32 and ell.data.shape[1] % 8 == 0
        y = spmv(ell, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y)[:30], a @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(y)[30:], 0.0)

    def test_spmv_t(self, rng):
        a, csr = random_csr(rng, 14, 26, 0.2)
        y = rng.random(14)
        x = spmv_t(from_csr(csr), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(x), a.T @ y, rtol=1e-12)

    def test_diag_and_l1(self, rng):
        a, csr = random_csr(rng, 25, 25, 0.3)
        ell = from_csr(csr)
        np.testing.assert_allclose(np.asarray(diag(ell)), np.diag(a))
        np.testing.assert_allclose(
            np.asarray(l1_row_norm(ell)), np.abs(a).sum(axis=1)
        )


class TestBSR:
    def test_roundtrip_and_spmv(self, rng):
        from amg_ann_tpu.sparse import from_csr_bsr, bsr_spmv, to_csr_bsr

        nb, b = 7, 3
        n = nb * b
        dense = np.zeros((n, n))
        # random block pattern
        for _ in range(12):
            i, j = rng.integers(0, nb, 2)
            dense[i*b:(i+1)*b, j*b:(j+1)*b] = rng.random((b, b))
        a = CSR.from_dense(dense)
        bs = from_csr_bsr(a, b)
        np.testing.assert_allclose(to_csr_bsr(bs).to_dense(), dense)
        x = rng.random(n)
        np.testing.assert_allclose(np.asarray(bsr_spmv(bs, jnp.asarray(x))),
                                   dense @ x, rtol=1e-12)

    def test_elasticity_matrix_through_bsr(self):
        from amg_ann_tpu.fem.elasticity import LinearElasticity
        from amg_ann_tpu.sparse import from_csr_bsr, bsr_spmv

        p = LinearElasticity(pattern_size=2, refinements=0, epsv=np.ones(8))
        a, _, _ = p.build()
        bs = from_csr_bsr(a, 3)
        x = np.random.default_rng(0).random(a.nrows)
        np.testing.assert_allclose(np.asarray(bsr_spmv(bs, jnp.asarray(x))),
                                   a.matvec(x), rtol=1e-10)


class TestAnisotropic:
    def test_operator_properties(self):
        from amg_ann_tpu.fem import anisotropic_27pt

        a = anisotropic_27pt(8, angle=np.pi / 6, ratio=50.0)
        d = a.to_dense()
        np.testing.assert_allclose(d, d.T, atol=1e-14)
        assert np.linalg.eigvalsh(d).min() > 0
        # axis-aligned case reduces to weighted 7-point
        a0 = anisotropic_27pt(4, angle=0.0, ratio=10.0)
        assert a0.sparsity < 7.5

    def test_amg_solves_anisotropic(self):
        from amg_ann_tpu.amg import AMGParams
        from amg_ann_tpu.fem import anisotropic_27pt
        from amg_ann_tpu.solvers import amg_solve

        a = anisotropic_27pt(12, angle=np.pi / 4, ratio=100.0)
        b = a.matvec(np.random.default_rng(0).random(12**3))
        # strong anisotropy: higher theta isolates the strong direction
        res = amg_solve(a, b, AMGParams(strong_threshold=0.5,
                                        smoother="chebyshev"),
                        rtol=1e-8, tol=0.0, maxiter=300)
        assert res.converged
