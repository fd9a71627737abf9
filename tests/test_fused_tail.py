"""Fused coarse-tail V-cycle kernel (sparse/pallas_cycle.py).

The kernel replaces solvers/cycle._cycle below level l0; these tests pin
it against that unfused path (interpret mode on CPU) at the exact
geometries the TPU bench hierarchy produces, including semicoarsened
(anisotropic) and jumping-coefficient hierarchies.
"""

import numpy as np
import pytest

import amg_ann_tpu.solvers.cycle as cycle_mod
from amg_ann_tpu.amg import AMGParams
from amg_ann_tpu.amg.structured_mg import setup_structured
from amg_ann_tpu.fem import (anisotropic_27pt, diffusion_7pt,
                             jumping_coefficient_field, poisson_7pt)
from amg_ann_tpu.sparse.pallas_cycle import (
    LANES, _coarse_pos_map, _selection_terms, build_fused_tail, tail_cycle,
)


def _apply_terms(terms, src2d, dst_rows):
    """Numpy oracle: dst = Σ_t onehot(rsrc_t) @ src @ onehot(lsrc_t)."""
    out = np.zeros((dst_rows, LANES), src2d.dtype)
    for rsrc, lsrc in terms:
        lmat = np.zeros((dst_rows, src2d.shape[0]), src2d.dtype)
        rows = np.flatnonzero(rsrc >= 0)
        lmat[rows, rsrc[rows]] = 1.0
        smat = np.zeros((LANES, LANES), src2d.dtype)
        lanes = np.flatnonzero(lsrc >= 0)
        smat[lsrc[lanes], lanes] = 1.0
        out += lmat @ src2d @ smat
    return out


class TestSelectionTerms:
    @pytest.mark.parametrize("shape,strides", [
        ((16, 16, 16), (2, 2, 2)),
        ((8, 8, 8), (2, 2, 2)),
        ((16, 8, 8), (2, 1, 2)),   # semicoarsening
        ((32, 32, 32), (2, 2, 2)),
    ])
    def test_subsample_roundtrip(self, shape, strides, rng):
        n = int(np.prod(shape))
        fmap = _coarse_pos_map(shape, strides)
        src_rows = -(-n // LANES)
        dst_rows = -(-fmap.size // LANES)
        terms = _selection_terms(np.arange(fmap.size), fmap,
                                 dst_rows, src_rows)
        assert terms is not None and len(terms) <= 16
        v = rng.random(src_rows * LANES).astype(np.float32)
        got = _apply_terms(terms, v.reshape(src_rows, LANES),
                           dst_rows).reshape(-1)[:fmap.size]
        np.testing.assert_array_equal(got, v[fmap])
        # interleave (scatter) direction
        terms_i = _selection_terms(fmap, np.arange(fmap.size),
                                   src_rows, dst_rows)
        assert terms_i is not None
        c = rng.random(dst_rows * LANES).astype(np.float32)
        c[fmap.size:] = 0.0
        got_f = _apply_terms(terms_i, c.reshape(dst_rows, LANES),
                             src_rows).reshape(-1)
        want = np.zeros(src_rows * LANES, np.float32)
        want[fmap] = c[:fmap.size]
        np.testing.assert_array_equal(got_f, want)


def _hierarchy(a, shape, params, monkeypatch):
    monkeypatch.setenv("AMG_FUSED_TAIL", "1")
    return setup_structured(a, shape, params)


def _tail_vs_unfused(h, rng, rtol=3e-4):
    ft = h.device.fused_tail
    assert ft is not None, "fused tail plan was not built"
    b = rng.standard_normal(ft.n0).astype(np.float32)
    x_fused = np.asarray(tail_cycle(ft, b, interpret=True))
    x_ref = np.asarray(cycle_mod._cycle(h.device, ft.l0, b))
    np.testing.assert_allclose(x_fused, x_ref, rtol=rtol, atol=1e-5)


class TestFusedTailKernel:
    def test_poisson_32(self, rng, monkeypatch):
        a = poisson_7pt(32, dtype=np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=64)
        h = _hierarchy(a, (32, 32, 32), params, monkeypatch)
        # small problems fuse the ENTIRE V-cycle into one launch
        assert h.device.fused_tail.l0 == 0
        _tail_vs_unfused(h, rng)

    def test_bench_geometry_64(self, rng, monkeypatch):
        # the exact bench hierarchy: 64³, chebyshev, max_coarse 2048
        a = poisson_7pt(64, dtype=np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=2048)
        h = _hierarchy(a, (64, 64, 64), params, monkeypatch)
        ft = h.device.fused_tail
        assert ft is not None and ft.l0 == 1
        _tail_vs_unfused(h, rng)

    def test_jumping_coefficients(self, rng, monkeypatch):
        n = 32
        kappa = jumping_coefficient_field(n, 4, rng.uniform(0, 6, 64),
                                          mode=3)
        a = diffusion_7pt(kappa, dtype=np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=64)
        h = _hierarchy(a, (n, n, n), params, monkeypatch)
        _tail_vs_unfused(h, rng)

    def test_anisotropic_semicoarsening(self, rng, monkeypatch):
        a = anisotropic_27pt(16, dtype=np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=64)
        h = _hierarchy(a, (16, 16, 16), params, monkeypatch)
        if h.device.fused_tail is None:
            pytest.skip("tail did not qualify (all-coarse hierarchy)")
        _tail_vs_unfused(h, rng)

    @pytest.mark.parametrize("smoother", ["jacobi", "l1jacobi"])
    def test_other_smoothers(self, smoother, rng, monkeypatch):
        a = poisson_7pt(32, dtype=np.float32)
        params = AMGParams(smoother=smoother, dtype=np.float32,
                           max_coarse_size=64)
        h = _hierarchy(a, (32, 32, 32), params, monkeypatch)
        _tail_vs_unfused(h, rng)

    def test_solve_parity(self, rng, monkeypatch):
        """Full PCG solve: fused tail == unfused path (same iterations)."""
        from amg_ann_tpu.solvers import amg_solve

        n = 32
        a = poisson_7pt(n, dtype=np.float32)
        b = a.matvec(rng.random(n**3)).astype(np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32,
                           max_coarse_size=64)
        h = _hierarchy(a, (n, n, n), params, monkeypatch)
        assert h.device.fused_tail is not None

        monkeypatch.setattr(cycle_mod, "FUSED_TAIL_MODE", "never")
        res_ref = amg_solve(a, b, params, hierarchy=h, rtol=1e-6)
        monkeypatch.setattr(cycle_mod, "FUSED_TAIL_MODE", "interpret")
        res_fused = amg_solve(a, b, params, hierarchy=h, rtol=1e-6)
        assert res_fused.niters == res_ref.niters
        np.testing.assert_allclose(np.asarray(res_fused.x),
                                   np.asarray(res_ref.x),
                                   rtol=1e-4, atol=1e-6)

    def test_cpu_auto_mode_not_engaged(self, rng, monkeypatch):
        """On CPU (auto mode) the plan may exist but must not engage."""
        a = poisson_7pt(16, dtype=np.float32)
        params = AMGParams(smoother="chebyshev", dtype=np.float32)
        h = _hierarchy(a, (16, 16, 16), params, monkeypatch)
        assert cycle_mod.FUSED_TAIL_MODE == "auto"
        assert not cycle_mod._use_fused_tail(h.device, 1)
