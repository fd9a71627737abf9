"""Device sparse format: padded ELL as a static-shape JAX pytree.

TPU/XLA wants static shapes and wide, regular memory access.  ELLPACK stores
each row's entries padded to a fixed width K:

    data: (nrows, K) values, zero in padding slots
    cols: (nrows, K) int32 column ids, 0 in padding slots

SpMV is then a gather of `x[cols]` plus a row-wise contraction — one fused
XLA gather/multiply/reduce, no data-dependent shapes anywhere.  Elliptic FEM
operators have near-uniform row counts (7/27-point stencils), so padding
waste is small; AMG coarse operators are denser but tiny.

This replaces the reference's device-side role of PETSc `MatMult` inside
KSP CG (reference: code/data-generation/common/amg_solver.h:54).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .csr import CSR


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class ELL:
    """Padded-ELL sparse matrix (device pytree; static shape metadata)."""

    data: jax.Array  # (nrows, K)
    cols: jax.Array  # (nrows, K) int32
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)  # true (unpadded) entry count

    @property
    def k(self) -> int:
        return self.data.shape[1]

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    def __matmul__(self, x):
        return spmv(self, x)


def from_csr(a: CSR, dtype=None, k_align: int = 1, row_align: int = 1) -> ELL:
    """Pack a host CSR matrix into padded ELL device arrays.

    k_align / row_align let callers pad K (lane dim) and nrows (sublane dim)
    up to hardware-friendly multiples; padded rows are all-zero.
    """
    if dtype is None:
        dtype = a.data.dtype
    row_nnz = a.row_nnz
    k = int(row_nnz.max()) if a.nrows else 1
    k = max(_round_up(max(k, 1), k_align), 1)
    nrows_p = max(_round_up(max(a.nrows, 1), row_align), 1)

    data = np.zeros((nrows_p, k), dtype=dtype)
    cols = np.zeros((nrows_p, k), dtype=np.int32)
    # position of each stored entry inside its row: 0..row_nnz-1
    rows = np.repeat(np.arange(a.nrows, dtype=np.int64), row_nnz)
    pos = np.arange(a.nnz, dtype=np.int64) - np.repeat(a.indptr[:-1], row_nnz)
    data[rows, pos] = a.data
    cols[rows, pos] = a.indices
    return ELL(
        data=jnp.asarray(data),
        cols=jnp.asarray(cols),
        nrows=a.nrows,
        ncols=a.ncols,
        nnz=a.nnz,
    )


def to_csr(a: ELL) -> CSR:
    """Unpack back to host CSR (drops explicit zeros from padding)."""
    data = np.asarray(a.data)[: a.nrows]
    cols = np.asarray(a.cols)[: a.nrows]
    rows = np.broadcast_to(
        np.arange(a.nrows, dtype=np.int64)[:, None], cols.shape
    )
    keep = data != 0
    return CSR.from_coo(
        rows[keep], cols[keep], data[keep], (a.nrows, a.ncols)
    )


def spmv(a: ELL, x: jax.Array) -> jax.Array:
    """y = A @ x. x may be longer than ncols (padded); y has a.data rows."""
    gathered = jnp.take(x, a.cols, axis=0)  # (nrows_p, K)
    return jnp.sum(a.data * gathered, axis=1)


def spmv_t(a: ELL, y: jax.Array) -> jax.Array:
    """x = A^T @ y via scatter-add (used only off the hot path; R is stored
    explicitly in the hierarchy so V-cycles never call this)."""
    contrib = a.data * y[: a.data.shape[0], None]
    flat_cols = a.cols.reshape(-1)
    return jnp.zeros(a.ncols, dtype=a.data.dtype).at[flat_cols].add(
        contrib.reshape(-1)
    )


def diag(a: ELL) -> jax.Array:
    """Diagonal of a square ELL matrix."""
    r = jnp.arange(a.data.shape[0], dtype=jnp.int32)[:, None]
    mask = (a.cols == r) & (a.data != 0)
    return jnp.sum(jnp.where(mask, a.data, 0.0), axis=1)


def l1_row_norm(a: ELL) -> jax.Array:
    """Σ_j |a_ij| per row (the ℓ1-Jacobi smoother diagonal)."""
    return jnp.sum(jnp.abs(a.data), axis=1)


@struct.dataclass
class DenseOp:
    """Small dense operator (device pytree) — the TPU-fast storage for
    classical-hierarchy COARSE levels.

    XLA's TPU gather executes the ELL SpMV ~600× below HBM speed of light;
    below a few thousand rows a dense matmul on the MXU beats it outright
    (one fused (n, n)×(n,) product), so classical coarse levels store
    their operators and transfer matrices densely (amg/hierarchy.py).
    """

    m: jax.Array                 # (nrows_padded, ncols_padded)
    nrows: int = struct.field(pytree_node=False)   # true row count
    ncols: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.nrows, self.ncols)


def dense_matvec(op: DenseOp, x):
    return op.m @ x
