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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap the JIT-executable footprint of the single pytest process.

    The full suite (~280 tests, hundreds of distinct XLA:CPU programs)
    crashed the compiler late in the run — SIGSEGV once, SIGABRT once,
    both inside backend_compile_and_load on the SAME test, while either
    half of the suite passes in isolation (logs/bisect_h{1,2}.log).
    That pattern is cumulative compiled-code state, not a poison test;
    dropping executable references between modules keeps the JIT arena
    bounded.  Costs per-module recompiles (~1 min over the suite)."""
    yield
    jax.clear_caches()
