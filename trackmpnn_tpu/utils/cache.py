"""Persistent XLA compilation cache.

First compiles through the TPU tunnel are slow (tens of seconds); the
persistent cache makes every subsequent process start warm.  Call once
before the first jit; respects JAX_COMPILATION_CACHE_DIR if already set.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "trackmpnn_tpu_xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
