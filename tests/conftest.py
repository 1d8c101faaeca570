"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize registers the `axon` TPU backend and calls
jax.config.update("jax_platforms", "axon,cpu") in every interpreter, which
overrides the JAX_PLATFORMS env var - so we must override the *config* after
importing jax, before any backend is touched.  The TPU is reserved for
bench.py; tests run on CPU with 8 virtual devices for sharding coverage.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(5)
