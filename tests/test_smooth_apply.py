"""Fused whole-smoother-application kernel (op_smooth_apply /
sparse/pallas_spmv._dia_apply_kernel).

Interpret-mode parity against the pure per-step recurrence at the call
patterns the V-cycle issues: pre-smoothing (x = 0, output residual) and
post-smoothing (x ≠ 0, initial residual computed IN-kernel, no output
residual), for all three smoother types, at geometries that exercise the
clamped windows. Plus solve-level parity: the rewired smooth_rx must not
change PCG iteration counts.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.fem import anisotropic_27pt, poisson_7pt
from amg_ann_tpu.sparse.dia import (dia_smooth_apply_fast, dia_spmv,
                                    from_csr_dia)


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _oracle(d_op, x, b, s, coefs, x_zero, want_res):
    """Pure numpy recurrence (the op_smooth_apply contract)."""
    r = b if x_zero else b - np.asarray(dia_spmv(d_op, x))
    d = coefs[0, 0] * (s * r)
    for j in range(1, coefs.shape[0]):
        t = np.asarray(dia_spmv(d_op, d))
        x = x + d
        r = r - t
        d = coefs[j, 0] * d + coefs[j, 1] * (s * r)
    if want_res:
        return x + d, r - np.asarray(dia_spmv(d_op, d))
    return x + d, None


def _check(a, coefs, x_zero, want_res, rng):
    d_op = from_csr_dia(a)
    rr = d_op.data.shape[1]
    n = rr * 128
    x = (np.zeros(n, np.float32) if x_zero
         else rng.random(n).astype(np.float32))
    b = rng.random(n).astype(np.float32)
    s = (0.1 + rng.random(n)).astype(np.float32)
    coefs = np.asarray(coefs, np.float32)
    want_x, want_r = _oracle(d_op, x, b, s, coefs, x_zero, want_res)
    got_x, got_r = dia_smooth_apply_fast(
        d_op, jnp.asarray(x[: d_op.n]), jnp.asarray(b[: d_op.n]),
        jnp.asarray(s[: d_op.n]), jnp.asarray(coefs), x_zero, want_res,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), want_x[: d_op.n],
                               rtol=3e-5, atol=1e-4)
    if want_res:
        np.testing.assert_allclose(np.asarray(got_r), want_r[: d_op.n],
                                   rtol=3e-5, atol=1e-4)
    else:
        assert got_r is None


CHEB2 = [[0.9, 0.0], [0.4, 0.6]]          # (init, ·), (c_a, c_b)
CHEB3 = [[0.9, 0.0], [0.4, 0.6], [0.2, 0.8]]
JAC = [[0.8, 0.0]]


class TestFusedApplyKernel:
    @pytest.mark.parametrize("coefs", [CHEB2, CHEB3, JAC])
    @pytest.mark.parametrize("x_zero,want_res", [
        (True, True),     # V-cycle pre-smooth
        (False, False),   # V-cycle post-smooth
        (False, True),    # generic
    ])
    def test_parity_7pt(self, coefs, x_zero, want_res, rng):
        if x_zero and len(coefs) == 1 and not want_res:
            pytest.skip("no stencil application — never routed here")
        _check(poisson_7pt(16, dtype=np.float32), coefs, x_zero,
               want_res, rng)

    def test_parity_27pt_multiblock(self, rng):
        # 27-offset stencil at 16³ (R=32): lane shifts {1,127}, several
        # window blocks, both clamped edges
        _check(anisotropic_27pt(16, angle=0.5, dtype=np.float32),
               CHEB2, False, False, rng)

    def test_parity_x_zero_skips_x_stream(self, rng):
        # garbage x must not affect the x_zero result (the kernel never
        # reads it)
        a = poisson_7pt(16, dtype=np.float32)
        d_op = from_csr_dia(a)
        n = d_op.n
        b = jnp.asarray(rng.random(n).astype(np.float32))
        s = jnp.asarray((0.1 + rng.random(n)).astype(np.float32))
        coefs = jnp.asarray(CHEB2, jnp.float32)
        x_gar = jnp.asarray(rng.random(n).astype(np.float32))
        got1, _ = dia_smooth_apply_fast(d_op, jnp.zeros(n, jnp.float32),
                                        b, s, coefs, True, True,
                                        interpret=True)
        got2, _ = dia_smooth_apply_fast(d_op, x_gar, b, s, coefs, True,
                                        True, interpret=True)
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(got2))


class TestSolveParity:
    @pytest.mark.parametrize("smoother", ["chebyshev", "jacobi",
                                          "l1jacobi"])
    def test_structured_solve_unchanged(self, smoother, rng):
        """The rewired smooth_rx (fused-apply dispatch) keeps the CPU
        solve identical in iterations and solution."""
        from amg_ann_tpu.amg.structured_mg import setup_structured
        from amg_ann_tpu.solvers import amg_solve

        n = 16
        a = poisson_7pt(n, dtype=np.float32)
        b = a.matvec(rng.random(n**3)).astype(np.float32)
        params = AMGParams(smoother=smoother, dtype=np.float32,
                           max_coarse_size=64)
        h = setup_structured(a, (n, n, n), params)
        res = amg_solve(a, b, params, hierarchy=h, rtol=1e-6)
        assert res.converged
        x = np.asarray(res.x)
        err = np.linalg.norm(a.matvec(x) - np.asarray(b))
        assert err / np.linalg.norm(np.asarray(b)) < 1e-5


class TestVmemFeasibility:
    """Scoped-vmem accounting for the fused-window kernels
    (bench/tpu_chain_r3.log: 129³ exceeded the declared limit by 336K;
    256³ windows can exceed any block size). Pure host math — pins the
    chooser decisions at bench-critical geometries."""

    def _offsets_3d(self, nx):
        # 27-point structured stencil offsets (matches boxmg DIA layout)
        return tuple(sorted(dz * nx * nx + dy * nx + dx
                            for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                            for dx in (-1, 0, 1)))

    def test_apply_129cubed_feasible_and_limit_dominates(self):
        from amg_ann_tpu.sparse import pallas_spmv as ps

        offs = self._offsets_3d(129)
        r = 16896  # padded_rows(129³ // 128)
        b = ps.smooth_apply_block_rows(27, r, offs, n_apps=2,
                                       x_zero=False, want_res=False)
        assert b is not None and r % b == 0
        need = ps._apply_need(27, 4, 1, b, 2 * ps.halo_rows(offs))
        # the declared limit must dominate the measured 22.87M actual
        # when b == 128 (the shape that failed in round 2)
        if b == 128:
            assert ps._vmem_limit(need) > int(22.87 * 2**20)
        assert ps._vmem_limit(need) <= ps._VMEM_HARD_CAP

    def test_apply_256cubed_infeasible_but_sweep_chunks_fit(self):
        from amg_ann_tpu.sparse import pallas_spmv as ps

        offs = self._offsets_3d(256)
        r = 131072  # 256³ // 128 (already a multiple of 512)
        # whole application (2+ stencil apps) cannot fit scoped vmem
        assert ps.smooth_apply_block_rows(27, r, offs, n_apps=3,
                                          x_zero=True,
                                          want_res=True) is None
        # ...but single fused sweep steps still do (bisected fallback)
        assert ps.cheb_sweep_block_rows(27, r, offs, steps=1) is not None

    def test_bench_shapes_unchanged(self):
        from amg_ann_tpu.sparse import pallas_spmv as ps

        # 64³ / 128³ benchmarked kernel shapes must not drift (warm
        # .jax_cache depends on them)
        offs64, offs128 = self._offsets_3d(64), self._offsets_3d(128)
        assert ps.smooth_apply_block_rows(
            27, 2048, offs64, n_apps=2, x_zero=False, want_res=False) == 128
        assert ps.smooth_apply_block_rows(
            27, 16384, offs128, n_apps=2, x_zero=False,
            want_res=False) == 128

    def test_apply_tc3_block_87diag_limit_dominates(self):
        """tc3 r=4 block operator (interleaved 3-component 27-pt stencil
        on 33³ → k=87 structural diagonals, halo 28 rows, padded r=896):
        the chooser picked b=64/n_apps=2 and the declared limit (19.89M)
        was exceeded by the measured 21.20M scoped usage
        (bench/tpu_chain_tc3.log) — the double-buffered k-diagonal
        coefficient block (2·k·B) was missing from _apply_need. Pin that
        the new accounting dominates the measured usage with margin."""
        from amg_ann_tpu.sparse import pallas_spmv as ps

        k, r, halo = 87, 896, 28
        for x_zero, want_res in ((False, False), (True, True)):
            b = ps.smooth_apply_block_rows(k, r, tuple(range(-43, 44)),
                                           n_apps=2, x_zero=x_zero,
                                           want_res=want_res)
            # stays feasible (datagen must not fall back at this size) …
            assert b is not None and r % b == 0
        n_vec, n_out = 3, 2
        need = ps._apply_need(k, n_vec, n_out, 64, 2 * halo)
        # … and the declared limit dominates the 21.20M measured actual
        assert ps._vmem_limit(need) > int(1.05 * 21.20 * 2**20)
        assert ps._vmem_limit(need) <= ps._VMEM_HARD_CAP
