"""Multi-host initialization and checkpoint coordination.

The reference has no distributed story at all (SURVEY.md 2).  Multi-host
runs here follow the standard JAX recipe: every host calls
`initialize_multihost()` before touching devices, builds the same global
mesh, and feeds its local shard of the window batch; XLA collectives ride
ICI within a slice and DCN across slices from the same sharding
annotations used single-host (parallel/data_parallel.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """jax.distributed.initialize from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op for single-process runs.  Returns topology info."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """Checkpoint/log writer election: process 0 only."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a [global_batch, ...] window batch."""
    per = global_batch // jax.process_count()
    lo = per * jax.process_index()
    return slice(lo, lo + per)
