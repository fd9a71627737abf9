"""Sparse formats and kernels.

Host construction format: `CSR` (numpy). Device solve format: `ELL`
(static-shape JAX pytree) with XLA gather SpMV; Pallas kernels live in
`pallas_spmv` and are selected by `spmv_fast` when profitable.
"""

from .bsr import BSR, bsr_spmv, from_csr_bsr, to_csr_bsr
from .csr import CSR
from .ell import ELL, diag, from_csr, l1_row_norm, spmv, spmv_t, to_csr
from .spgemm import spgemm

__all__ = [
    "CSR", "ELL", "BSR", "from_csr_bsr", "bsr_spmv", "to_csr_bsr", "spgemm", "from_csr", "to_csr", "spmv", "spmv_t",
    "diag", "l1_row_norm",
]
