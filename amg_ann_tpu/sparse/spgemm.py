"""Host SpGEMM (C = A·B) used by the Galerkin triple product R·A·P.

Primary path: native C++ Gustavson kernel (native/csparse.cpp).
Fallback: scipy.sparse. Both produce per-row-sorted CSR.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import load_csparse
from .csr import CSR


def _as_ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def spgemm_native(a: CSR, b: CSR) -> CSR | None:
    lib = load_csparse()
    if lib is None:
        return None
    a_indptr = np.ascontiguousarray(a.indptr, dtype=np.int64)
    a_indices = np.ascontiguousarray(a.indices, dtype=np.int32)
    a_data = np.ascontiguousarray(a.data, dtype=np.float64)
    b_indptr = np.ascontiguousarray(b.indptr, dtype=np.int64)
    b_indices = np.ascontiguousarray(b.indices, dtype=np.int32)
    b_data = np.ascontiguousarray(b.data, dtype=np.float64)

    c_indptr = ctypes.POINTER(ctypes.c_int64)()
    c_indices = ctypes.POINTER(ctypes.c_int32)()
    c_data = ctypes.POINTER(ctypes.c_double)()
    c_nnz = np.zeros(1, dtype=np.int64)

    m, k = a.shape
    _, n = b.shape
    rc = lib.csparse_spgemm(
        m, k, n,
        _as_ptr(a_indptr, ctypes.c_int64),
        _as_ptr(a_indices, ctypes.c_int32),
        _as_ptr(a_data, ctypes.c_double),
        _as_ptr(b_indptr, ctypes.c_int64),
        _as_ptr(b_indices, ctypes.c_int32),
        _as_ptr(b_data, ctypes.c_double),
        ctypes.byref(c_indptr), ctypes.byref(c_indices), ctypes.byref(c_data),
        _as_ptr(c_nnz, ctypes.c_int64),
    )
    if rc != 0:
        return None
    nnz = int(c_nnz[0])
    try:
        indptr = np.ctypeslib.as_array(c_indptr, shape=(m + 1,)).copy()
        indices = np.ctypeslib.as_array(c_indices, shape=(max(nnz, 1),))[:nnz].copy()
        data = np.ctypeslib.as_array(c_data, shape=(max(nnz, 1),))[:nnz].copy()
    finally:
        lib.csparse_free_i64(c_indptr)
        lib.csparse_free_i32(c_indices)
        lib.csparse_free_f64(c_data)
    return CSR(indptr, indices, data.astype(a.data.dtype), (m, n))


def spgemm_scipy(a: CSR, b: CSR) -> CSR:
    import scipy.sparse as sp

    sa = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    sb = sp.csr_matrix((b.data, b.indices, b.indptr), shape=b.shape)
    sc = (sa @ sb).tocsr()
    sc.sort_indices()
    return CSR(
        sc.indptr.astype(np.int64),
        sc.indices.astype(np.int32),
        sc.data,
        sc.shape,
    )


def spgemm(a: CSR, b: CSR) -> CSR:
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    c = spgemm_native(a, b)
    if c is None:
        c = spgemm_scipy(a, b)
    return c
