"""Multi-host (DCN) initialization scaffolding.

On a multi-host TPU pod slice the same sharded code paths (sharded.py,
halo.py) run unchanged once `jax.distributed.initialize()` has made every
host's local devices part of one global mesh: `make_mesh()` then returns a
mesh spanning all hosts, row shards land per-host, and GSPMD/ppermute
collectives ride ICI within a host and DCN across hosts.

Not exercisable in this dev environment (one TPU chip behind a tunnel);
kept as the documented production entry point. nnz/s scaling methodology:
run `scaling_report` on 1 host and N hosts and compare
per-chip-nnz/s — the BASELINE target is ≥70% efficiency.
"""

from __future__ import annotations

import numpy as np
import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (env-var autodetect when args
    are None — the TPU pod runtime sets them)."""
    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def scaling_report(n: int = 128, rtol: float = 1e-6) -> dict:
    """Per-chip nnz/s for a structured AMG-PCG solve on the global mesh.

    Run on every host (SPMD); returns the figures on process 0.
    """
    import time

    from ..amg.hierarchy import AMGParams
    from ..amg.structured_mg import setup_structured
    from ..fem import poisson_7pt
    from ..solvers import ir_solve
    from .sharded import make_mesh

    a = poisson_7pt(n, dtype=np.float32)
    b = a.matvec(np.random.default_rng(0).random(n ** 3))
    params = AMGParams(smoother="chebyshev", dtype=np.float32)
    h = setup_structured(a, (n, n, n), params)
    res = ir_solve(a, b, params, hierarchy=h, rtol=rtol)  # warm
    res = ir_solve(a, b, params, hierarchy=h, rtol=rtol)
    n_dev = len(jax.devices())
    total_nnz = res.inner_iters * sum(h.stats.nnz)
    return {
        "devices": n_dev,
        "processes": jax.process_count(),
        "t_solve_s": res.t_solve / 1e6,
        "nnz_per_s_per_chip": total_nnz / (res.t_solve / 1e6) / n_dev,
        "converged": res.converged,
    }
