"""θ-cost ANN: two-input CNN+MLP in flax (reference: cnn_models.py).

Architecture parity with `generic_build_model` (cnn_models.py:189-245):

    view image (vs, vs, C) ─ CNN ─ flatten ─ Dense(bottleneck) ─┐
                                                                 ├─ concat
    scalar params (nparams,) ───────────────────────────────────┘
        → depth3 × Dense(wide3, act)
        → Dense(1)                      (learn_err=False)
        → [Dense(1), softplus Dense(1)]  (learn_err=True — heteroscedastic
                                          mean/variance heads)

`classic` CNN (cnn_models.py:26-59): Conv(wide1, k, SAME) + act, then
(depth1−1)× Conv(wide1, k, VALID) + act, MaxPool 2×2; optional second block
— which the reference builds with wide1 (not wide2) in its inner loop; we
reproduce that behavior for parity.

Loss `mse_mvar` (cnn_models.py:12-15): MSE on the mean head plus MSE between
the *stop-gradiented* squared error and the variance head.

TPU notes: NHWC conv layout (native for XLA:TPU), he_uniform init like the
reference, float32 params with optional bfloat16 compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

KERNEL_INIT = nn.initializers.he_uniform()


class ClassicCNN(nn.Module):
    """`classic_convolutional_model` parity."""

    wide1: int = 16
    depth1: int = 2
    wide2: int = 32
    depth2: int = 1
    kernel_size: int = 3
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.act)
        k = (self.kernel_size, self.kernel_size)
        x = nn.Conv(self.wide1, k, padding="SAME", kernel_init=KERNEL_INIT,
                    dtype=self.dtype)(x)
        x = act(x)
        for _ in range(self.depth1 - 1):
            x = nn.Conv(self.wide1, k, padding="VALID",
                        kernel_init=KERNEL_INIT, dtype=self.dtype)(x)
            x = act(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        if self.wide2 * self.depth2 > 0:
            x = nn.Conv(self.wide2, k, padding="SAME",
                        kernel_init=KERNEL_INIT, dtype=self.dtype)(x)
            x = act(x)
            for _ in range(self.depth2 - 1):
                # reference uses wide1 here (cnn_models.py:52-53); kept.
                x = nn.Conv(self.wide1, k, padding="VALID",
                            kernel_init=KERNEL_INIT, dtype=self.dtype)(x)
                x = act(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class ThetaCostModel(nn.Module):
    """`generic_build_model` parity: (view, params) → cost (+ variance)."""

    nparams: int = 3
    cnn_type: str = "classic"
    wide1: int = 16
    depth1: int = 2
    wide2: int = 32
    depth2: int = 1
    bottleneck: int = 32
    wide3: int = 64
    depth3: int = 2
    kernel_size: int = 3
    act: str = "relu"
    learn_err: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, view, params):
        act = getattr(nn, self.act)
        if self.cnn_type == "classic":
            x = ClassicCNN(self.wide1, self.depth1, self.wide2, self.depth2,
                           self.kernel_size, self.act, self.dtype)(view)
        else:
            from .backbones import BACKBONE_TABLE, DROPPED_BACKBONES

            if self.cnn_type in BACKBONE_TABLE:
                x = BACKBONE_TABLE[self.cnn_type](self.act, self.dtype)(view)
            elif self.cnn_type in DROPPED_BACKBONES:
                raise NotImplementedError(
                    f"cnn_type {self.cnn_type!r} is covered by the "
                    f"{DROPPED_BACKBONES[self.cnn_type]!r} family here — "
                    "see ann/backbones.py (documented drop)")
            else:
                raise NotImplementedError(f"cnn_type {self.cnn_type!r}")
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.bottleneck, kernel_init=KERNEL_INIT,
                     dtype=self.dtype)(x)
        x = jnp.concatenate([x, params.astype(x.dtype)], axis=-1)
        for _ in range(self.depth3):
            x = act(nn.Dense(self.wide3, kernel_init=KERNEL_INIT,
                             dtype=self.dtype)(x))
        mean = nn.Dense(1, kernel_init=KERNEL_INIT, dtype=self.dtype)(x)
        if not self.learn_err:
            return mean.astype(jnp.float32)
        var = nn.softplus(nn.Dense(1, kernel_init=KERNEL_INIT,
                                   dtype=self.dtype)(x))
        return jnp.concatenate([mean, var], axis=-1).astype(jnp.float32)


# -- losses (cnn_models.py:12-22) -------------------------------------------
def mse(y_true, y_pred):
    return jnp.mean((y_true - y_pred[:, 0:1]) ** 2)


def mse_var(y_true, y_pred):
    e = y_true - y_pred[:, 0:1]
    return jnp.mean((e * e - y_pred[:, 1:2]) ** 2)


def mse_mvar(y_true, y_pred):
    """Heteroscedastic loss: mean-head MSE + variance-head fit to the
    detached squared error (stop_gradient ≡ tf.stop_gradient in the ref)."""
    e = y_true - y_pred[:, 0:1]
    e2 = jax.lax.stop_gradient(e * e)
    return jnp.mean(e * e) + jnp.mean((e2 - y_pred[:, 1:2]) ** 2)


def mae(y_true, y_pred):
    return jnp.mean(jnp.abs(y_true - y_pred[:, 0:1]))
