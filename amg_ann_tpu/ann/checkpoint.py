"""Model persistence: config JSON + params msgpack (flax serialization).

Role-equivalent to the reference's Keras `model.h5` save/load +
pretrain/fine-tune path (train_ann.py:279-306, 354-368).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
from flax import serialization

from .models import ThetaCostModel

_CONFIG_KEYS = [f.name for f in dataclasses.fields(ThetaCostModel)
                if f.name not in ("parent", "name", "dtype")]


def save_model(path: str, model: ThetaCostModel, params, *, view_size: int,
               channels: int) -> None:
    """view_size/channels pin the input spec — the post-flatten Dense kernel
    shape depends on them, so load needs them to rebuild a template."""
    os.makedirs(path, exist_ok=True)
    cfg = {k: getattr(model, k) for k in _CONFIG_KEYS}
    cfg["__input__"] = {"view_size": view_size, "channels": channels}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))


def load_model(path: str):
    """Returns (model, params, input_spec dict)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    spec = cfg.pop("__input__")
    model = ThetaCostModel(**cfg)
    # build a params template to restore into
    import jax

    view = jnp.zeros((1, spec["view_size"], spec["view_size"],
                      spec["channels"]))
    pvec = jnp.zeros((1, model.nparams))
    template = model.init(jax.random.PRNGKey(0), view, pvec)["params"]
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return model, params, spec
