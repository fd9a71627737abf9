"""Training driver for the θ-cost ANN (train_ann.py parity, JAX-native).

Mirrors `fit_model` (train_ann.py:263-313): Adam, shuffled minibatches,
Keras-style validation_split (tail fraction held out, untouched by the
per-epoch shuffle), ReduceLROnPlateau on the training loss (factor 0.5,
min_delta 1e-9, min_lr 1e-8), best-loss checkpointing, history records.

TPU-first: one jitted train step (donated state), full-batch jitted eval;
the optimizer lr is an injected hyperparameter so plateau reductions don't
retrace.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .models import ThetaCostModel, mae, mse, mse_mvar, mse_var


class TrainState(train_state.TrainState):
    pass


@dataclasses.dataclass
class FitResult:
    state: Any                 # final TrainState
    best_params: Any           # params at the best training loss
    history: list              # list of per-epoch dicts
    best_loss: float


WARMUP_STEPS = 300


def create_state(model: ThetaCostModel, rng, view_shape, lr: float = 1e-3,
                 warmup_steps: int | None = None):
    """Adam with a linear LR warmup over the first `warmup_steps` batches.

    Why warmup (root cause of the r4 mse_mvar divergence, VERDICT r5
    item 1): Adam's bias-corrected early updates are ±lr sign-steps per
    parameter. The mse_mvar variance term is QUARTIC in the prediction
    error e (‖e²−var‖² with e² ~ e⁴ once e > 1), so one unlucky shuffle
    can make the trunk gradients keep a coherent sign across the
    bottleneck Dense's ~10⁴ fan-in; the output then grows by
    O(fan_in·lr) per step, which grows e, which locks the gradient sign
    — runaway from epoch 0 (loss 1e11→1e16, observed on the 600-problem
    tc1 subset while 300/877 trained fine by shuffle luck; regression:
    tests/test_pipeline.py::TestMvarWarmup). Gradient clipping does NOT fix
    it (Adam is gradient-scale invariant); warmup does, by keeping steps
    small until second-moment estimates are populated."""
    view = jnp.zeros((1, *view_shape))
    params_vec = jnp.zeros((1, model.nparams))
    variables = model.init(rng, view, params_vec)
    if warmup_steps is None:
        warmup_steps = WARMUP_STEPS
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if warmup_steps > 0:
        tx = optax.chain(tx, optax.scale_by_schedule(
            lambda step: jnp.minimum(1.0, (step + 1.0) / warmup_steps)))
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             tx=tx)


def _hyperparams(opt_state):
    """The inject_hyperparams dict, whether tx is bare adam or the
    warmup chain."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    for s in opt_state:
        if hasattr(s, "hyperparams"):
            return s.hyperparams
    raise AttributeError("no inject_hyperparams state found")


def _loss_fn(learn_err: bool):
    return mse_mvar if learn_err else mse


def make_train_step(model: ThetaCostModel, grad_mask=None):
    loss_fn = _loss_fn(model.learn_err)

    @jax.jit
    def train_step(state: TrainState, view, pvec, target):
        def loss(params):
            pred = state.apply_fn({"params": params}, view, pvec)
            return loss_fn(target, pred), pred

        (l, pred), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        if grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
        state = state.apply_gradients(grads=grads)
        return state, l, pred

    return train_step


def make_eval_step(model: ThetaCostModel):
    loss_fn = _loss_fn(model.learn_err)

    @jax.jit
    def eval_step(params, view, pvec, target):
        pred = model.apply({"params": params}, view, pvec)
        out = {"loss": loss_fn(target, pred), "mae": mae(target, pred),
               "mse": mse(target, pred)}
        if model.learn_err:
            out["mse_var"] = mse_var(target, pred)
        return out

    return eval_step


def freeze_mask(params, n_frozen: int):
    """Boolean pytree: False for the first n_frozen top-level modules (in
    flax's sorted order) — the reference's layer-freeze option
    (train_ann.py:381-383)."""
    names = sorted(params.keys())
    frozen = set(names[:n_frozen])
    return {k: jax.tree.map(lambda _: k not in frozen, v)
            for k, v in params.items()}


def fit(model: ThetaCostModel, view_data, param_data, target_data, *,
        epochs: int = 100, batch_size: int = 32, validation_split: float = 0.0,
        patience: int = 5, lr: float = 1e-3, seed: int = 0,
        state: TrainState | None = None, verbose: bool = False,
        lr_factor: float = 0.5, min_delta: float = 1e-9,
        min_lr: float = 1e-8, freeze: int = 0) -> FitResult:
    """Train; returns final + best-loss params and per-epoch history.

    freeze > 0 zero-masks gradients of the first `freeze` modules."""
    view_data = np.asarray(view_data, dtype=np.float32)
    param_data = np.asarray(param_data, dtype=np.float32)
    target_data = np.asarray(target_data, dtype=np.float32).reshape(-1, 1)
    n = view_data.shape[0]

    n_val = int(round(validation_split * n))
    if n_val:
        v_view, v_par, v_tgt = (view_data[-n_val:], param_data[-n_val:],
                                target_data[-n_val:])
        view_data, param_data, target_data = (
            view_data[:-n_val], param_data[:-n_val], target_data[:-n_val])
        n = n - n_val

    rng = jax.random.PRNGKey(seed)
    if state is None:
        rng, init_rng = jax.random.split(rng)
        state = create_state(model, init_rng, view_data.shape[1:], lr)
    else:
        _hyperparams(state.opt_state)["learning_rate"] = jnp.asarray(lr)

    mask = None
    if freeze > 0:
        mask = jax.tree.map(lambda b: jnp.asarray(1.0 if b else 0.0),
                            freeze_mask(state.params, freeze))
    train_step = make_train_step(model, mask)
    eval_step = make_eval_step(model)

    np_rng = np.random.default_rng(seed)
    history = []
    best_loss = np.inf
    best_params = state.params
    plateau = 0
    cur_lr = lr

    for epoch in range(epochs):
        t0 = time.perf_counter()
        perm = np_rng.permutation(n)
        losses = []
        for start in range(0, n, batch_size):
            idx = perm[start:start + batch_size]
            state, l, _ = train_step(state, view_data[idx], param_data[idx],
                                     target_data[idx])
            losses.append(float(l))
        # epoch metrics on the full training set (Keras reports running
        # means; full-set eval is the cleaner JAX equivalent)
        m = {k: float(v) for k, v in
             eval_step(state.params, view_data, param_data,
                       target_data).items()}
        rec = {"epoch": epoch, **m, "lr": cur_lr,
               "t_epoch": time.perf_counter() - t0}
        if n_val:
            vm = eval_step(state.params, v_view, v_par, v_tgt)
            rec.update({f"val_{k}": float(v) for k, v in vm.items()})
        history.append(rec)
        if verbose:
            print(f"epoch {epoch:04d} " +
                  " ".join(f"{k}={v:.4e}" for k, v in m.items()))

        # checkpoint best + ReduceLROnPlateau on training loss
        if m["loss"] < best_loss - min_delta:
            best_loss = m["loss"]
            best_params = jax.tree.map(lambda x: x.copy(), state.params)
            plateau = 0
        else:
            plateau += 1
            if plateau >= patience and cur_lr > min_lr:
                cur_lr = max(cur_lr * lr_factor, min_lr)
                _hyperparams(state.opt_state)["learning_rate"] = jnp.asarray(
                    cur_lr)
                plateau = 0

    return FitResult(state=state, best_params=best_params, history=history,
                     best_loss=best_loss)


@functools.lru_cache(maxsize=8)
def _jit_apply(model: ThetaCostModel):
    # cached per model CONFIG (flax Modules are frozen/hashable): a fresh
    # jax.jit closure per predict() call would discard the compiled
    # executable every time — deployment-fatal on TPU, where each
    # recompile costs minutes through the tunnel
    return jax.jit(lambda p, v, pv: model.apply({"params": p}, v, pv))


def predict(model: ThetaCostModel, params, view_data, param_data,
            batch_size: int = 4096):
    """Batched inference; returns (N, 1|2) float32."""
    view_data = np.asarray(view_data, dtype=np.float32)
    param_data = np.asarray(param_data, dtype=np.float32)

    step = _jit_apply(model)
    outs = []
    for s in range(0, view_data.shape[0], batch_size):
        outs.append(np.asarray(step(params, view_data[s:s + batch_size],
                                    param_data[s:s + batch_size])))
    return np.concatenate(outs, axis=0)
