"""C/F splitting: PMIS (parallel-friendly) with deterministic seeding.

Classical Ruge–Stüben's first pass is inherently sequential; PMIS (De
Sterck, Yang, Heys 2006) is the standard parallel substitute used by
BoomerAMG at scale and is the natural choice for a TPU-native framework —
the selection step is a local max over the strength neighborhood, which
maps to vectorized/segment operations. Host path uses the native C++
kernel (native/csparse.cpp: csparse_pmis); a pure-numpy fallback keeps the
package importable without a compiler.

Aggressive coarsening (AdditionalData.aggressive_coarsening_num_levels,
used by the reference's testcase3 with value 2, testcase3 main.cpp:454-464)
is realized as a second PMIS pass on the distance-2 strength graph S·S
restricted to first-pass C points.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import load_csparse
from ..sparse.csr import CSR
from ..sparse.spgemm import spgemm


def _pmis_weights(s: CSR, seed: int) -> np.ndarray:
    """w_i = (#points strongly depending on i) + U[0,1), deterministic."""
    col_count = np.zeros(s.ncols, dtype=np.int64)
    np.add.at(col_count, s.indices.astype(np.int64), 1)
    rng = np.random.default_rng(seed)
    return col_count.astype(np.float64) + rng.random(s.ncols)


def pmis(s: CSR, seed: int = 0) -> np.ndarray:
    """PMIS C/F split of the strength graph. Returns bool mask (True = C)."""
    n = s.nrows
    if n == 0:
        return np.zeros(0, dtype=bool)
    st = s.transpose()
    w = _pmis_weights(s, seed)

    lib = load_csparse()
    if lib is not None:
        cf = np.zeros(n, dtype=np.int8)
        s_indptr = np.ascontiguousarray(s.indptr, dtype=np.int64)
        s_indices = np.ascontiguousarray(s.indices, dtype=np.int32)
        st_indptr = np.ascontiguousarray(st.indptr, dtype=np.int64)
        st_indices = np.ascontiguousarray(st.indices, dtype=np.int32)
        lib.csparse_pmis(
            n,
            s_indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            s_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            st_indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            st_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.ascontiguousarray(w).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            cf.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        return cf.astype(bool)
    return _pmis_numpy(s, st, w)


def _pmis_numpy(s: CSR, st: CSR, w: np.ndarray) -> np.ndarray:
    """Vectorized numpy PMIS with identical semantics to the native kernel."""
    n = s.nrows
    state = np.zeros(n, dtype=np.int8)  # 0 undecided, 1 C, -1 F
    srows, scols, _ = s.row_expand()
    trows, tcols, _ = st.row_expand()
    # undirected neighbor edge list (i, j)
    ei = np.concatenate([srows, trows])
    ej = np.concatenate([scols, tcols])
    isolated = np.ones(n, dtype=bool)
    isolated[ei] = False
    state[isolated] = -1

    # tie-break by index: effective weight key (w, -index) via lexicographic
    while np.any(state == 0):
        und = state == 0
        # neighbor max weight among undecided neighbors
        live = und[ei] & und[ej]
        best_w = np.full(n, -np.inf)
        np.maximum.at(best_w, ei[live], w[ej[live]])
        # strict local max, ties to smaller index
        tie = np.zeros(n, dtype=bool)
        eq = live & (w[ej] == w[ei])
        lower = eq & (ej < ei)
        np.logical_or.at(tie, ei[lower], True)
        new_c = und & ((w > best_w) | ((w == best_w) & ~tie))
        if not np.any(new_c):
            state[und] = 1
            break
        state[new_c] = 1
        # undecided points that strongly depend on a new C point -> F
        dep = new_c[scols] & (state[srows] == 0)
        state[srows[dep]] = -1
    return state == 1


def aggressive_pass(s: CSR, cf: np.ndarray, seed: int = 0) -> np.ndarray:
    """Thin a C/F split by re-coarsening C points over the S·S graph.

    Returns the new (sparser) C mask over the ORIGINAL index set.
    """
    c_idx = np.flatnonzero(cf)
    if c_idx.size <= 1:
        return cf
    # distance-2 strength among C points: pattern of (S + I)·(S + I)
    ones = CSR(s.indptr, s.indices, np.ones_like(s.data), s.shape)
    eye = CSR.eye(s.nrows, dtype=s.data.dtype)
    s1 = CSR.from_coo(
        np.concatenate([ones.row_expand()[0], eye.row_expand()[0]]),
        np.concatenate([ones.row_expand()[1], eye.row_expand()[1]]),
        np.concatenate([ones.data, eye.data]),
        s.shape,
    )
    s2 = spgemm(s1, s1)
    mask = cf.astype(bool)
    s2_cc = s2.extract(mask, mask)
    # remove the diagonal from the subgraph
    r2, c2, v2 = s2_cc.row_expand()
    offd = r2 != c2
    s2_cc = CSR.from_coo(r2[offd], c2[offd], v2[offd], s2_cc.shape,
                         sum_duplicates=False)
    sub_cf = pmis(s2_cc, seed=seed + 1)
    new_cf = np.zeros_like(cf)
    new_cf[c_idx[sub_cf]] = True
    return new_cf
