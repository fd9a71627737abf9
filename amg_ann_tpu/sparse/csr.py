"""Host-side CSR sparse matrix (numpy).

This is the *construction / setup* format: FEM assembly, AMG coarsening,
interpolation and Galerkin products all manipulate CSR on host, then ship
static-shape ELL pytrees (see `ell.py`) to the device for the solve phase.

Role-equivalent to the PETSc `MPI::SparseMatrix` the reference builds in
`code/data-generation/testcase2-diffusion-structured/src/main.cpp:198,248`
(single rank), but designed for a host-build/device-solve split instead of
a library call into hypre.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CSR:
    """Compressed sparse row matrix (host, numpy).

    indptr:  (nrows+1,) int64 — row k occupies [indptr[k], indptr[k+1]).
    indices: (nnz,)     int32 — column of each stored entry (sorted per row).
    data:    (nnz,)     float — value of each stored entry.
    shape:   (nrows, ncols).
    """

    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray
    shape: tuple

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_coo(rows, cols, vals, shape, sum_duplicates=True) -> "CSR":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        # O(nnz) sortedness check saves the O(nnz log nnz) lexsort for the
        # many internal callers that pass row-major-ordered triplets
        presorted = True
        if rows.size > 1:
            dr = rows[1:] - rows[:-1]
            presorted = bool(np.all(dr >= 0))
            if presorted:
                ties = dr == 0
                presorted = bool(np.all(cols[1:][ties] > cols[:-1][ties]))
        if not presorted:
            order = np.lexsort((cols, rows))
            rows, cols, vals = rows[order], cols[order], vals[order]
        if sum_duplicates and rows.size:
            # first occurrence of each (row, col) pair in the sorted stream
            first = np.empty(rows.size, dtype=bool)
            first[0] = True
            np.logical_or(
                rows[1:] != rows[:-1], cols[1:] != cols[:-1], out=first[1:]
            )
            group = np.cumsum(first) - 1
            out_vals = np.zeros(int(group[-1]) + 1, dtype=vals.dtype)
            np.add.at(out_vals, group, vals)
            rows, cols, vals = rows[first], cols[first], out_vals
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSR(indptr, cols.astype(np.int32), vals, tuple(shape))

    @staticmethod
    def from_dense(a, tol=0.0) -> "CSR":
        a = np.asarray(a)
        rows, cols = np.nonzero(np.abs(a) > tol)
        return CSR.from_coo(rows, cols, a[rows, cols], a.shape)

    @staticmethod
    def eye(n, dtype=np.float64) -> "CSR":
        return CSR(
            np.arange(n + 1, dtype=np.int64),
            np.arange(n, dtype=np.int32),
            np.ones(n, dtype=dtype),
            (n, n),
        )

    # -- basic properties --------------------------------------------------
    @property
    def nrows(self):
        return self.shape[0]

    @property
    def ncols(self):
        return self.shape[1]

    @property
    def nnz(self):
        return int(self.indptr[-1])

    @property
    def row_nnz(self):
        return np.diff(self.indptr)

    @property
    def sparsity(self):
        """Average stored entries per row (hypre's per-level 'sparsity')."""
        return self.nnz / max(self.nrows, 1)

    def diagonal(self):
        d = np.zeros(min(self.shape), dtype=self.data.dtype)
        for_rows = np.repeat(
            np.arange(self.nrows, dtype=np.int64), self.row_nnz
        )
        mask = for_rows == self.indices
        d_rows = for_rows[mask]
        d[d_rows] = self.data[mask]
        return d

    def row_expand(self):
        """(rows, cols, vals) COO triplets view of this matrix."""
        rows = np.repeat(np.arange(self.nrows, dtype=np.int64), self.row_nnz)
        return rows, self.indices.astype(np.int64), self.data

    # -- ops ---------------------------------------------------------------
    def matvec(self, x):
        x = np.asarray(x)
        rows, cols, vals = self.row_expand()
        return np.bincount(rows, weights=vals * x[cols],
                           minlength=self.nrows).astype(
            np.result_type(self.data, x))

    def transpose(self) -> "CSR":
        rows, cols, vals = self.row_expand()
        return CSR.from_coo(
            cols, rows, vals, (self.shape[1], self.shape[0]),
            sum_duplicates=False,
        )

    def to_dense(self):
        out = np.zeros(self.shape, dtype=self.data.dtype)
        rows, cols, vals = self.row_expand()
        out[rows, cols] = vals
        return out

    def extract(self, row_mask, col_mask) -> "CSR":
        """Submatrix of rows where row_mask and cols where col_mask.

        Columns are renumbered to the compressed indexing of col_mask.
        """
        rows, cols, vals = self.row_expand()
        keep = row_mask[rows] & col_mask[cols]
        row_map = np.cumsum(row_mask) - 1
        col_map = np.cumsum(col_mask) - 1
        return CSR.from_coo(
            row_map[rows[keep]],
            col_map[cols[keep]],
            vals[keep],
            (int(row_mask.sum()), int(col_mask.sum())),
            sum_duplicates=False,
        )

    def scale_rows(self, s) -> "CSR":
        rows, _, _ = self.row_expand()
        return CSR(self.indptr, self.indices, self.data * s[rows], self.shape)

    def scale_sym(self, s) -> "CSR":
        """Symmetric diagonal scaling diag(s) · A · diag(s)."""
        rows, _, _ = self.row_expand()
        return CSR(self.indptr, self.indices,
                   self.data * s[rows] * s[self.indices], self.shape)

    def drop_zeros(self, tol=0.0) -> "CSR":
        rows, cols, vals = self.row_expand()
        keep = np.abs(vals) > tol
        return CSR.from_coo(
            rows[keep], cols[keep], vals[keep], self.shape,
            sum_duplicates=False,
        )

    def astype(self, dtype) -> "CSR":
        return CSR(self.indptr, self.indices, self.data.astype(dtype), self.shape)

    def __matmul__(self, other: "CSR") -> "CSR":
        from . import spgemm

        return spgemm.spgemm(self, other)
