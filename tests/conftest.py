"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Multi-chip TPU hardware is unavailable in dev; distributed tests run on a
virtual CPU mesh (XLA host-platform device count), which exercises the same
sharding + collective code paths jit would run on a pod slice.
"""

import os

# NOTE: this image's sitecustomize registers the axon TPU plugin in every
# process and pins JAX_PLATFORMS=axon, so a plain env setdefault is not
# enough — force the CPU backend through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
