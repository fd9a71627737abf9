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
