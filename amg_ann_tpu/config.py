"""Global configuration: dtype policy.

The reference solves in IEEE double everywhere (PETSc default scalar).
On TPU, f64 is software-emulated but available; f32 is the fast path.
Policy:
  * correctness tests / parity runs: float64 (requires JAX_ENABLE_X64).
  * TPU benchmarks: float32 value arrays with float64 (or compensated)
    scalar recurrences where convergence to 1e-8 relative demands it.

`default_dtype()` returns the dtype new matrices/vectors are built with.
"""

from __future__ import annotations

import jax.numpy as jnp

_DEFAULT_DTYPE = None


def default_dtype():
    """Dtype for newly built operators: f64 when x64 is enabled, else f32."""
    global _DEFAULT_DTYPE
    if _DEFAULT_DTYPE is not None:
        return _DEFAULT_DTYPE
    import jax

    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def set_default_dtype(dtype):
    """Force the framework default dtype (None restores auto-detection)."""
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = None if dtype is None else jnp.dtype(dtype)


def index_dtype():
    return jnp.int32
