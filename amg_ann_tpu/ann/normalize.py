"""View normalization modes and channel stacking (train_ann.py parity).

`norm_view` reproduces train_ann.py:133-172 exactly (all 10 shipped modes;
`pure_log` is the configuration used by every shipped metadata file).
`stack_channels` reproduces `df_to_model_input`'s view_type table
(train_ann.py:25,222-258): sum=1, max=1, max_ppnp=2, sum+max=3, sum+max+c=4
channels.
"""

from __future__ import annotations

import numpy as np

VIEW_TYPE_CHANNELS = {"sum": 1, "max": 1, "max_ppnp": 2, "sum+max": 3,
                      "sum+max+c": 4}
NORMALIZATION_MODES = [
    "pure", "resc", "pure_log", "resc_log", "nothing", "mean",
    "dataset_pure", "log_nothing", "gaussian", "resc_gaussian",
]
UNBOUNDED_NORMALIZATION_MODES = ["nothing", "mean", "gaussian",
                                 "resc_gaussian"]


def extended_log(x):
    return np.log(np.abs(x) + 1) * np.sign(x)


def _unit_scale(x):
    """x / max|x|, with an all-zero channel passed through unchanged
    (a 0/0 here would NaN the whole image; an identically-zero channel —
    e.g. max_np of a matrix with no negative entries — is information in
    itself and is kept as zeros)."""
    m = np.abs(x).max()
    return x / m if m > 0 else x


def _safe_div_by_count(matrx, count):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(count > 0, matrx / count, 0.0)


def stack_channels_device(view, view_type: str, mode: str):
    """jnp twin of stack_channels for the DEPLOYMENT fast path (modes
    pure | pure_log — the shipped configurations): normalize + stack on
    device so the whole predict pipeline (view/pooling.make_view_stencil
    → here → pipeline/evaluate.pred_theta_device) runs with zero host
    syncs. Jitted as ONE dispatch — the ~12 eager ops cost ~100 ms each
    through the axon tunnel and dominated the 129³ warm predict (r3:
    2.4 s). Host stack_channels stays the oracle; parity is pinned in
    tests/test_ann_solver.py."""
    return _stack_channels_jit(view_type, mode)(view)


import functools


@functools.lru_cache(maxsize=16)
def _stack_channels_jit(view_type: str, mode: str):
    import functools as _ft

    import jax

    # cached per (view_type, mode): a fresh jit per call would retrace
    return jax.jit(_ft.partial(_stack_channels_device_impl,
                               view_type=view_type, mode=mode))


def _stack_channels_device_impl(view, *, view_type: str, mode: str):
    import jax.numpy as jnp

    if mode not in ("pure", "pure_log"):
        raise KeyError(f"device path supports pure|pure_log, got {mode!r}")

    def elog(x):
        return jnp.log(jnp.abs(x) + 1.0) * jnp.sign(x)

    def unit(x):
        m = jnp.abs(x).max()
        return x / jnp.where(m > 0, m, 1.0)

    def nv(x):
        x = jnp.asarray(x).astype(jnp.float32)
        return unit(elog(x)) if mode == "pure_log" else unit(x)

    s, pp, np_, cnt = (nv(view.sum), nv(view.max_pp), nv(view.max_np),
                       nv(view.count))
    if view_type == "sum":
        chans = [s]
    elif view_type == "max":
        chans = [jnp.maximum(pp, np_)]
    elif view_type == "max_ppnp":
        chans = [pp, np_]
    elif view_type == "sum+max":
        chans = [s, pp, np_]
    elif view_type == "sum+max+c":
        chans = [s, pp, np_, cnt]
    else:
        raise KeyError(f"Unrecognised view type: {view_type!r}")
    return jnp.stack(chans, axis=-1)


def norm_view(matrx, count, mode, dataset_max=None):
    """Normalize one (vs, vs) channel. matrx = channel, count = view_count."""
    matrx = np.asarray(matrx, dtype=np.float64)
    count = np.asarray(count)
    if mode == "pure":
        return _unit_scale(matrx)
    if mode == "resc":
        return _unit_scale(_safe_div_by_count(matrx, count))
    if mode == "pure_log":
        return _unit_scale(extended_log(matrx))
    if mode == "resc_log":
        return _unit_scale(extended_log(_safe_div_by_count(matrx, count)))
    if mode == "nothing":
        return matrx
    if mode == "mean":
        return _safe_div_by_count(matrx, count)
    if mode == "dataset_pure":
        return matrx / dataset_max
    if mode == "log_nothing":
        if matrx.min() < 0:
            return extended_log(matrx)
        return np.log(matrx + 1e-30)
    if mode == "gaussian":
        return (matrx - np.mean(matrx)) / np.std(matrx)
    if mode == "resc_gaussian":
        tmp = _safe_div_by_count(matrx, count)
        return (tmp - np.mean(tmp)) / np.std(tmp)
    raise KeyError(f"Unrecognised matrix normalization mode {mode!r}")


def check_normalized(matrix, mode):
    """The trainer's sanity checks (train_ann.py:195-218)."""
    if np.isnan(matrix).any() or np.isinf(matrix).any():
        raise ValueError(f"view has inf or nan entry, normalization {mode}")
    if mode not in UNBOUNDED_NORMALIZATION_MODES and (
            np.any(matrix > 1) or np.any(matrix < -1)):
        raise ValueError(f"view is not properly normalized with {mode}")


def stack_channels(view_sum, view_max_pp, view_max_np, view_count,
                   view_type: str, mode: str, dataset_max=None,
                   check: bool = True):
    """Normalize + stack the requested channels → (vs, vs, C) image.

    The count channel is normalized with the same mode when the mode
    supports counts (train_ann.py NORM_MODES_COUNT = pure, pure_log).
    """
    nv = lambda m: norm_view(m, view_count, mode, dataset_max)
    if view_type == "sum":
        chans = [nv(view_sum)]
    elif view_type == "max":
        chans = [np.maximum(nv(view_max_pp), nv(view_max_np))]
    elif view_type == "max_ppnp":
        chans = [nv(view_max_pp), nv(view_max_np)]
    elif view_type == "sum+max":
        chans = [nv(view_sum), nv(view_max_pp), nv(view_max_np)]
    elif view_type == "sum+max+c":
        if mode not in ("pure", "pure_log"):
            raise KeyError(
                f"count channel requires mode pure|pure_log, got {mode!r}")
        chans = [nv(view_sum), nv(view_max_pp), nv(view_max_np),
                 norm_view(view_count, view_count, mode, dataset_max)]
    else:
        raise KeyError(f"Unrecognised view type: {view_type!r}")
    if check:
        for c in chans:
            check_normalized(c, mode)
    return np.stack(chans, axis=-1)
