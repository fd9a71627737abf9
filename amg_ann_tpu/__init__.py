"""amg_ann_tpu — a TPU-native algebraic-multigrid + θ-predicting-ANN framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
AMG-ANN reference (MatteoCaldana/AMG-ANN): FEM problem generators for 3D
elliptic PDEs, an algebraic multigrid PCG solver stack (the reference
outsources this to hypre BoomerAMG via PETSc — here it is native), the
sparse-matrix pooling ("view") featurizer, the CNN+MLP θ-predictor, and the
data-generation / preprocessing / training / evaluation pipeline.

Layout (bottom-up):
    sparse/    CSR (host, numpy) and ELL/SELL (device, JAX pytree) formats,
               SpMV/SpMM kernels (XLA + Pallas).
    amg/       strength-of-connection, PMIS coarsening, interpolation,
               Galerkin RAP, hierarchy setup + stats.
    solvers/   smoothers (Jacobi/l1-Jacobi/Chebyshev), V-cycle, PCG,
               amg_solve() entry point with reference-parity stats.
    fem/       structured/unstructured problem generators, manufactured
               solutions, error norms (testcase1/2/2.1/3 parity).
    view/      pooling operator (sum/count/max_pp/max_np balanced binning).
    ann/       flax CNN+MLP θ-cost model, losses, training, normalization.
    pipeline/  sweep harness (stats CSV), preprocessing, evaluation.
    dist/      row-partitioned distributed SpMV / V-cycle over a device mesh.
    native/    C++ host-side kernels (SpGEMM, coarsening) via ctypes.
"""

__version__ = "0.1.0"

from . import config as config
from .config import default_dtype, set_default_dtype
