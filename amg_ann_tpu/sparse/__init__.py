"""Sparse formats and kernels.

Host construction format: `CSR` (numpy). Device solve formats:
  * `ELL`  — padded gather SpMV (general matrices; CPU/parity path),
  * `DIA`  — banded shift SpMV with a Pallas TPU kernel (the fast path),
  * `BSR`  — block-ELL for vector-valued operators (elasticity).
Host SpGEMM (Galerkin products) runs through native C++ (native/csparse).
"""

from .bsr import BSR, bsr_spmv, from_csr_bsr, to_csr_bsr
from .csr import CSR
from .dia import DIA, dia_spmv, dia_spmv_fast, from_csr_dia, num_offsets
from .ell import ELL, diag, from_csr, l1_row_norm, spmv, spmv_t, to_csr
from .spgemm import spgemm
from .well import (WELL, from_csr as from_csr_well, rcm_perm,
                   spmv as well_spmv, to_csr as to_csr_well)

__all__ = [
    "CSR", "ELL", "DIA", "BSR", "WELL",
    "from_csr", "to_csr", "spmv", "spmv_t", "diag", "l1_row_norm",
    "from_csr_dia", "dia_spmv", "dia_spmv_fast", "num_offsets",
    "from_csr_bsr", "bsr_spmv", "to_csr_bsr",
    "from_csr_well", "well_spmv", "to_csr_well", "rcm_perm",
    "spgemm",
]
