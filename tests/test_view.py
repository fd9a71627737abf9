"""Pooling operator: exact parity with the reference's ViewMaker binning."""

import numpy as np
import pytest

from amg_ann_tpu.fem import anisotropic_27pt, poisson_7pt
from amg_ann_tpu.sparse import CSR
from amg_ann_tpu.view import make_view, make_view_device, make_view_host
from amg_ann_tpu.view.pooling import bin_index


def reference_view(a: CSR, vs: int):
    """Literal transcription of view_maker.h:41-66 as the golden oracle."""
    n = a.nrows
    q = n // vs
    q1 = q + 1
    p = n % vs
    t = q1 * p
    v_sum = np.zeros(vs * vs)
    v_cnt = np.zeros(vs * vs, dtype=np.int64)
    v_pp = np.zeros(vs * vs)
    v_np = np.zeros(vs * vs)
    for i in range(n):
        bin_row = i // q1 if i < t else (i - t) // q + p
        for jj in range(a.indptr[i], a.indptr[i + 1]):
            col = a.indices[jj]
            v = a.data[jj]
            bin_col = col // q1 if col < t else (col - t) // q + p
            fb = vs * bin_row + bin_col
            v_sum[fb] += v
            v_cnt[fb] += 1
            v_pp[fb] = max(max(v, 0.0), v_pp[fb])
            v_np[fb] = max(max(-v, 0.0), v_np[fb])
    return v_sum, v_cnt, v_pp, v_np


@pytest.mark.parametrize("n,vs", [(10, 3), (64, 8), (100, 7), (27, 27)])
def test_bin_index_balanced(n, vs):
    bins = bin_index(np.arange(n), n, vs)
    # partition: non-decreasing, covers 0..vs-1, sizes differ by <= 1
    assert bins[0] == 0 and bins[-1] == vs - 1
    assert np.all(np.diff(bins) >= 0)
    sizes = np.bincount(bins, minlength=vs)
    assert sizes.max() - sizes.min() <= 1
    # first p bins are the bigger ones
    p = n % vs
    if p:
        assert np.all(sizes[:p] == n // vs + 1)
        assert np.all(sizes[p:] == n // vs)


@pytest.mark.parametrize("vs", [5, 7, 16])
def test_host_matches_reference(rng, vs):
    a = CSR.from_dense(
        (rng.random((50, 50)) - 0.5) * (rng.random((50, 50)) < 0.2))
    view = make_view_host(a, vs)
    g_sum, g_cnt, g_pp, g_np = reference_view(a, vs)
    np.testing.assert_allclose(view.sum.ravel(), g_sum, atol=1e-14)
    np.testing.assert_array_equal(view.count.ravel(), g_cnt)
    np.testing.assert_allclose(view.max_pp.ravel(), g_pp, atol=1e-14)
    np.testing.assert_allclose(view.max_np.ravel(), g_np, atol=1e-14)


def test_device_matches_host(rng):
    a = CSR.from_dense(
        (rng.random((40, 40)) - 0.5) * (rng.random((40, 40)) < 0.3))
    host = make_view_host(a, 6)
    from amg_ann_tpu.sparse import from_csr

    dev = make_view_device(from_csr(a), a.row_nnz, 6)
    np.testing.assert_allclose(np.asarray(dev.sum), host.sum, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(dev.count), host.count)
    np.testing.assert_allclose(np.asarray(dev.max_pp), host.max_pp, atol=1e-14)
    np.testing.assert_allclose(np.asarray(dev.max_np), host.max_np, atol=1e-14)


def test_stored_zeros_count(rng):
    """Explicit stored zeros must increment count (PETSc MatGetRow parity)."""
    a = CSR.from_coo([0, 0, 1], [0, 1, 1], [1.0, 0.0, 2.0], (4, 4))
    assert a.nnz == 3
    host = make_view_host(a, 2)
    assert host.count.sum() == 3
    from amg_ann_tpu.sparse import from_csr

    dev = make_view_device(from_csr(a), a.row_nnz, 2)
    # NOTE: ELL packing keeps explicit zeros (from_csr does not drop them)
    assert int(np.asarray(dev.count).sum()) == 3


def test_poisson_view_shape_and_timing():
    a = poisson_7pt(8)
    view, t_us = make_view(a, 16)
    assert view.sum.shape == (16, 16)
    assert t_us > 0
    assert view.stack().shape == (16, 16, 4)
    # Laplacian: every row sums ~0 in the interior => total sum is small
    assert view.count.sum() == a.nnz


def test_stencil_view_matches_host_tc2():
    """Deployment fast path: make_view_stencil (device, from the resident
    27-slot stencil) must reproduce make_view_host on a real tc2 assembly
    — including the count channel (geometric 27-pt validity == the stored
    structural pattern of the Q1 assembly)."""
    from amg_ann_tpu.amg.boxmg import csr_to_stencil
    from amg_ann_tpu.fem.structured import StructuredDiffusion
    from amg_ann_tpu.view.pooling import make_view_stencil

    p = StructuredDiffusion(pattern_size=4, refinements=2, degree=1,
                            mode=2, epsv=np.linspace(0, 4, 16))
    a, _, _ = p.build()
    gs = (p.n_nodes_1d,) * 3
    s = csr_to_stencil(a, gs)
    assert s is not None
    for vs in (7, 16):
        host = make_view_host(a, vs)
        dev = make_view_stencil(s, gs, vs)
        np.testing.assert_allclose(np.asarray(dev.sum), host.sum,
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(dev.count), host.count)
        np.testing.assert_allclose(np.asarray(dev.max_pp), host.max_pp,
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(dev.max_np), host.max_np,
                                   rtol=1e-6, atol=1e-12)


def test_stencil_view_anisotropic_27pt():
    from amg_ann_tpu.amg.boxmg import csr_to_stencil
    from amg_ann_tpu.view.pooling import make_view_stencil

    a = anisotropic_27pt(9)
    s = csr_to_stencil(a, (9, 9, 9))
    host = make_view_host(a, 11)
    dev = make_view_stencil(s, (9, 9, 9), 11, structural=False)
    np.testing.assert_allclose(np.asarray(dev.sum), host.sum,
                               rtol=1e-6, atol=1e-12)
    # anisotropic_27pt drops zero taps -> structural=False count parity
    np.testing.assert_array_equal(np.asarray(dev.count), host.count)
    np.testing.assert_allclose(np.asarray(dev.max_pp), host.max_pp,
                               rtol=1e-6, atol=1e-12)


def test_view_stencil_fast_vs_ref():
    """Scatter-free _make_view_stencil == the segment-op reference twin,
    including small grids where a slot offset spans >2 bin edges (P>3
    pieces) and non-divisible n."""
    import jax.numpy as jnp

    from amg_ann_tpu.view.pooling import (_make_view_stencil,
                                          _make_view_stencil_ref,
                                          _slot_pieces)

    rng = np.random.default_rng(7)
    for gs, vs in (((12, 12, 12), 40), ((9, 10, 11), 17),
                   ((24, 24, 24), 75), ((6, 7, 8), 5)):
        n = gs[0] * gs[1] * gs[2]
        s = jnp.asarray(rng.standard_normal((27, n)).astype(np.float32))
        for structural in (True, False):
            fast = _make_view_stencil(s, gs, vs, structural)
            ref = _make_view_stencil_ref(s, gs, vs, structural)
            for a, b, name in zip(fast, ref,
                                  ("sum", "cnt", "pp", "np")):
                # sum channel: accumulation-order float noise only
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3,
                    err_msg=f"{gs} vs={vs} structural={structural} {name}")
    # invariant: the in-bin window is <= q+1 long, so a slot offset can
    # cross at most 2 bin edges regardless of |off| — P <= 3 always
    ps = [_slot_pieces(6 * 7 * 8, 30, off)[0].shape[1]
          for off in (-57, -8, -1, 1, 8, 57)]
    assert max(ps) <= 3, ps
