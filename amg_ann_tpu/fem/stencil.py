"""Finite-difference stencil operators on structured 3D grids.

The fast path for AMG development and benchmarking (BASELINE.json config 1:
"3D Poisson, 7-point stencil on 64^3"). Variable-coefficient diffusion uses
harmonic face averages, which reproduces the jumping-coefficient behavior
the reference's testcase2 exercises through Q1 FEM.
"""

from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR


def poisson_7pt(n: int, dtype=np.float64, scale_h: bool = True):
    """7-point Laplacian on an n×n×n interior grid of the unit cube.

    Homogeneous Dirichlet boundary (eliminated). With `scale_h` the operator
    is h·(FD stencil) ≡ the Q1-FEM-like scaling where the diagonal is O(h):
    entries (6, -1, ...) are multiplied by h = 1/(n+1). Returns CSR of shape
    (n³, n³).
    """
    h = 1.0 / (n + 1)
    s = h if scale_h else 1.0
    idx = np.arange(n**3).reshape(n, n, n)

    rows = [idx.ravel()]
    cols = [idx.ravel()]
    vals = [np.full(n**3, 6.0 * s, dtype=dtype)]
    for axis in range(3):
        for shift in (-1, 1):
            src = [slice(None)] * 3
            dst = [slice(None)] * 3
            if shift == 1:
                src[axis], dst[axis] = slice(0, n - 1), slice(1, n)
            else:
                src[axis], dst[axis] = slice(1, n), slice(0, n - 1)
            r = idx[tuple(src)].ravel()
            c = idx[tuple(dst)].ravel()
            rows.append(r)
            cols.append(c)
            vals.append(np.full(r.size, -1.0 * s, dtype=dtype))
    return CSR.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        (n**3, n**3),
    )


def diffusion_7pt(kappa: np.ndarray, dtype=np.float64):
    """Variable-coefficient FD diffusion −∇·(κ∇u) on a structured grid.

    kappa: (n, n, n) cell-centered coefficient field. Face conductances are
    harmonic means of adjacent cells; homogeneous Dirichlet outside (ghost
    coefficient = the boundary cell's own κ). Matrix scaled by h so rows are
    O(h) like the FEM operators.
    """
    n = kappa.shape[0]
    assert kappa.shape == (n, n, n)
    h = 1.0 / (n + 1)
    idx = np.arange(n**3).reshape(n, n, n)
    kappa = kappa.astype(dtype)

    diag = np.zeros((n, n, n), dtype=dtype)
    rows, cols, vals = [], [], []
    for axis in range(3):
        ka = np.moveaxis(kappa, axis, 0)
        ia = np.moveaxis(idx, axis, 0)
        da = np.moveaxis(diag, axis, 0)
        # interior faces between slabs i and i+1
        face = 2.0 * ka[:-1] * ka[1:] / (ka[:-1] + ka[1:])
        da[:-1] += face
        da[1:] += face
        rows.append(ia[:-1].ravel())
        cols.append(ia[1:].ravel())
        vals.append(-face.ravel())
        rows.append(ia[1:].ravel())
        cols.append(ia[:-1].ravel())
        vals.append(-face.ravel())
        # boundary faces (Dirichlet): conductance = own κ
        da[0] += ka[0]
        da[-1] += ka[-1]
    rows.append(idx.ravel())
    cols.append(idx.ravel())
    vals.append(diag.ravel())
    a = CSR.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        (n**3, n**3),
    )
    return CSR(a.indptr, a.indices, (a.data * h).astype(dtype), a.shape)


def anisotropic_27pt(n: int, tensor: np.ndarray | None = None,
                     angle: float = 0.0, ratio: float = 100.0,
                     dtype=np.float64):
    """FD discretization of −∇·(K∇u) with a constant anisotropic tensor K
    (BASELINE config 4: rotated tensor coefficients).

    K defaults to R(angle)·diag(1, 1/ratio, 1/ratio)·R(angle)ᵀ with R a
    rotation in the x-y plane. Mixed derivatives use the standard 4-point
    cross stencil, giving a 27-point-bounded (here ≤ 19-point) operator.
    Dirichlet-eliminated interior grid, h-scaled like poisson_7pt.
    """
    if tensor is None:
        c, s = np.cos(angle), np.sin(angle)
        r = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        tensor = r @ np.diag([1.0, 1.0 / ratio, 1.0 / ratio]) @ r.T
    k = np.asarray(tensor, dtype=np.float64)
    assert k.shape == (3, 3)
    h = 1.0 / (n + 1)
    idx = np.arange(n ** 3).reshape(n, n, n)

    rows, cols, vals = [], [], []

    def add(src_slice, dst_slice, v):
        r = idx[src_slice].ravel()
        c = idx[dst_slice].ravel()
        rows.append(r)
        cols.append(c)
        vals.append(np.full(r.size, v, dtype=dtype))

    sl = slice(None)
    full = (sl, sl, sl)
    diag_val = 2.0 * (k[0, 0] + k[1, 1] + k[2, 2])
    add(full, full, diag_val)
    axes = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for d, dvec in enumerate(axes):
        for shift in (-1, 1):
            src = [sl] * 3
            dst = [sl] * 3
            ax = dvec.index(1)
            if shift == 1:
                src[ax], dst[ax] = slice(0, n - 1), slice(1, n)
            else:
                src[ax], dst[ax] = slice(1, n), slice(0, n - 1)
            add(tuple(src), tuple(dst), -k[d, d])
    # mixed terms: −2k_ab ∂²/∂a∂b via the 4-corner cross stencil
    for a in range(3):
        for b_ax in range(a + 1, 3):
            kab = k[a, b_ax]
            if kab == 0.0:
                continue
            for sa in (-1, 1):
                for sb in (-1, 1):
                    src = [sl] * 3
                    dst = [sl] * 3
                    for ax, sh in ((a, sa), (b_ax, sb)):
                        if sh == 1:
                            src[ax], dst[ax] = slice(0, n - 1), slice(1, n)
                        else:
                            src[ax], dst[ax] = slice(1, n), slice(0, n - 1)
                    add(tuple(src), tuple(dst), -0.5 * kab * sa * sb)
    out = CSR.from_coo(np.concatenate(rows), np.concatenate(cols),
                       np.concatenate(vals), (n ** 3, n ** 3))
    return CSR(out.indptr, out.indices, (out.data * h).astype(dtype),
               out.shape)


def jumping_coefficient_field(n: int, pattern_size: int, eps_exponents,
                              mode: int = 3):
    """Piecewise-constant κ = 10^ε on a pattern of macro-cells.

    Mirrors the reference's DiffusionCoef indicator (testcase2 main.cpp:
    101-113): the domain is split into pattern_size macro-slabs per axis and
    ε is looked up by indicator Σ_{i<mode} trunc-coord_i · pattern_size^i —
    mode 1 = planes, 2 = lines, 3 = cells.
    """
    eps = np.asarray(eps_exponents, dtype=np.float64)
    assert eps.size == pattern_size**mode
    # cell-center coordinates mapped to macro indices
    centers = (np.arange(n) + 0.5) / n  # in (0,1)
    macro = np.minimum((centers * pattern_size).astype(np.int64),
                       pattern_size - 1)
    ind = np.zeros((n, n, n), dtype=np.int64)
    for i in range(mode):
        coord = macro.reshape([-1 if a == i else 1 for a in range(3)])
        ind += coord * pattern_size**i
    return 10.0 ** eps[ind]
