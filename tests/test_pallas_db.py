"""Double-buffered / shift-shared Pallas kernels (sparse/pallas_spmv.py).

Interpret-mode parity of the pipelined DIA SpMV (`db=True`) against the
serial kernel and the jnp reference, at geometries that exercise the
clamped-window arithmetic (first/last blocks, nonzero delta) and
multi-shift stencils (27-point: lane shifts {1, 127}).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from amg_ann_tpu.fem import anisotropic_27pt, poisson_7pt
from amg_ann_tpu.sparse.dia import dia_spmv, from_csr_dia
from amg_ann_tpu.sparse.pallas_spmv import dia_spmv_pallas_nopad


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _case(a, rng, block_rows):
    d = from_csr_dia(a)
    assert d is not None
    r = d.data.shape[1]
    x = rng.random(r * 128).astype(np.float32)
    ref = np.asarray(dia_spmv(d, x))[: d.n]
    x2d = jnp.asarray(x.reshape(r, 128))
    for db in (False, True):
        y = dia_spmv_pallas_nopad(d.data, x2d, d.offsets,
                                  block_rows=block_rows, db=db,
                                  interpret=True)
        got = np.asarray(y).reshape(-1)[: d.n]
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5,
                                   err_msg=f"db={db}")


class TestPipelinedSpMV:
    def test_poisson_7pt_small_blocks(self, rng):
        # 16³ → R=32 rows; block 4 → 8 grid steps, halo 2 taps cross
        # every block boundary and both clamped edges
        _case(poisson_7pt(16, dtype=np.float32), rng, block_rows=4)

    def test_poisson_7pt_two_blocks(self, rng):
        _case(poisson_7pt(16, dtype=np.float32), rng, block_rows=16)

    def test_aniso_27pt_multi_shift(self, rng):
        # 27-offset stencil: lane shifts {1, 127} exercise the shared
        # shifted-window path with more than one zv slot
        _case(anisotropic_27pt(16, angle=0.5, dtype=np.float32), rng,
              block_rows=8)

    def test_smooth_step_db(self, rng):
        """Pipelined fused smoother step == serial kernel == jnp path."""
        from amg_ann_tpu.sparse.pallas_spmv import dia_smooth_step_pallas

        a = poisson_7pt(16, dtype=np.float32)
        d_op = from_csr_dia(a)
        r_rows = d_op.data.shape[1]
        n = r_rows * 128
        x, r, d, s = (jnp.asarray(rng.random(n).astype(np.float32)
                                  .reshape(r_rows, 128)) for _ in range(4))
        coef = jnp.asarray([0.7, 0.3], dtype=jnp.float32)
        outs = {}
        for db in (False, True):
            outs[db] = dia_smooth_step_pallas(
                d_op.data, x, r, d, s, coef, d_op.offsets, block_rows=8,
                db=db, interpret=True)
        for a_, b_ in zip(outs[False], outs[True]):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-6, atol=1e-7)
        # jnp oracle
        t = np.asarray(dia_spmv(d_op, np.asarray(d).reshape(-1)))
        xo = np.asarray(x).reshape(-1) + np.asarray(d).reshape(-1)
        ro = np.asarray(r).reshape(-1) - t
        do = 0.7 * np.asarray(d).reshape(-1) + 0.3 * (
            np.asarray(s).reshape(-1) * ro)
        got = [np.asarray(v).reshape(-1) for v in outs[True]]
        np.testing.assert_allclose(got[0], xo, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(got[1], ro, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(got[2], do, rtol=2e-5, atol=1e-4)

    def test_auto_block_rows(self, rng):
        # default block_rows heuristic (what the solve path uses)
        a = poisson_7pt(16, dtype=np.float32)
        d = from_csr_dia(a)
        r = d.data.shape[1]
        x = rng.random(r * 128).astype(np.float32)
        ref = np.asarray(dia_spmv(d, x))[: d.n]
        y = dia_spmv_pallas_nopad(d.data, jnp.asarray(x.reshape(r, 128)),
                                  d.offsets, db=True, interpret=True)
        np.testing.assert_allclose(np.asarray(y).reshape(-1)[: d.n], ref,
                                   rtol=2e-5, atol=1e-5)
