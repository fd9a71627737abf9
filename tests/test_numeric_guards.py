"""Enforced numeric guards (VERDICT r2 item 8): x64-required paths must
raise with guidance instead of warn-and-stall."""

import numpy as np
import pytest
import jax

from amg_ann_tpu.fem import poisson_7pt
from amg_ann_tpu.solvers.refine import ir_solve


def _with_x64_off(fn):
    jax.config.update("jax_enable_x64", False)
    try:
        return fn()
    finally:
        jax.config.update("jax_enable_x64", True)


def test_ir_solve_x64_off_tight_rtol_via_ds():
    """DIA-structured operators reach 1e-8 WITHOUT x64: the outer
    residual runs in double-single two-f32 arithmetic
    (sparse/double_single.py) instead of emulated f64."""
    a = poisson_7pt(8)
    b = np.ones(a.nrows)
    r = _with_x64_off(lambda: ir_solve(a, b, rtol=1e-8))
    assert r.converged and r.true_res <= 1e-8


def test_ir_solve_requires_x64_without_dia_structure():
    """No DIA structure → no ds residual → the x64 guard still bites."""
    from amg_ann_tpu.sparse.csr import CSR

    rng = np.random.default_rng(0)
    n = 400
    # random sparsity: ~n distinct offsets, far beyond the DIA cap
    rows = np.repeat(np.arange(n), 4)
    cols = rng.integers(0, n, rows.size)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([np.full(rows.size - n, -0.1), np.full(n, 5.0)])
    order = np.lexsort((cols, rows))
    a = CSR.from_coo(rows[order], cols[order], vals[order], (n, n))
    b = np.ones(n)
    with pytest.raises(RuntimeError, match="x64"):
        _with_x64_off(lambda: ir_solve(a, b, rtol=1e-8))


def test_ir_solve_f32_loose_rtol_ok():
    a = poisson_7pt(8)
    b = np.ones(a.nrows)
    r = _with_x64_off(lambda: ir_solve(a, b, rtol=1e-5))
    assert r.converged


def test_lanczos_raises_on_f32_divergence(monkeypatch):
    """Force a non-finite recurrence and check the x64-off diagnosis."""
    from amg_ann_tpu.solvers import eigen as eig

    a = poisson_7pt(6)

    def fake_lanczos(a_ell, v0, m):
        al = np.zeros(m, np.float32)
        be = np.ones(m, np.float32)
        al[3] = np.nan
        return al, be

    monkeypatch.setattr(eig, "_lanczos", fake_lanczos)
    with pytest.raises(RuntimeError, match="x64"):
        _with_x64_off(lambda: eig.lanczos_extremal(a, m=8))
    # under x64 the same tail truncates to a usable prefix
    r = eig.lanczos_extremal(a, m=8)
    assert np.isfinite(r.lam_max)
