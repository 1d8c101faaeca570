"""Persistent XLA compilation cache.

First compiles through the TPU tunnel are slow (tens of seconds); the
persistent cache makes every subsequent process start warm.  Call once
before the first jit; respects JAX_COMPILATION_CACHE_DIR if already set.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """No-op on the CPU backend: XLA:CPU AOT artifacts embed the COMPILE
    machine's feature set, and loading an entry produced by a different
    host (rounds run on different machines) warns `cpu_aot_loader` and can
    SIGSEGV outright (observed: tests/test_vis_training crashing on a
    round-2 cache entry).  CPU compiles are fast anyway — the cache exists
    for the 30s+ TPU tunnel compiles."""
    import jax

    if jax.config.jax_platforms == "cpu":
        return ""
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "trackmpnn_tpu_xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
