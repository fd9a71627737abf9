"""Profiling hooks (SURVEY §5 tracing line).

The reference's tracing surface is chrono spans written into the stats
CSV (common/amg_solver.h:47-56, view_maker.h:35,72-73) — our solvers
return those as first-class values. The TPU-native addition is an
opt-in `jax.profiler` trace so a solve/bench can be opened in
Perfetto/TensorBoard:

    with trace_if("/tmp/trace"):          # no-op when dir is falsy
        ir_solve(...)

bench.py honors BENCH_PROFILE=<dir>.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace_if(log_dir: str | None):
    """jax.profiler.trace(log_dir) when log_dir is truthy, else no-op."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named span inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
