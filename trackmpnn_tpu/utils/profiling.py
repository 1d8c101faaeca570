"""Tracing and throughput counters (the aux subsystem the reference lacks,
SURVEY.md 5: its only observability is loss printing).

- `trace(dir)`: context manager around jax.profiler.trace for TensorBoard/
  Perfetto traces of the jit'd steps.
- `Throughput`: rolling edges/s / graphs/s / steps/s counters, the
  north-star metric stream.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block with the JAX profiler (no-op if dir None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling-window throughput meter for training/inference loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self.samples = deque(maxlen=window)
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, edges: int = 0, graphs: int = 0, steps: int = 0):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.samples.append((dt, edges, graphs, steps))

    @property
    def edges_per_sec(self) -> float:
        t = sum(s[0] for s in self.samples)
        return sum(s[1] for s in self.samples) / t if t > 0 else 0.0

    @property
    def graphs_per_sec(self) -> float:
        t = sum(s[0] for s in self.samples)
        return sum(s[2] for s in self.samples) / t if t > 0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        t = sum(s[0] for s in self.samples)
        return sum(s[3] for s in self.samples) / t if t > 0 else 0.0

    def report(self) -> str:
        return json.dumps({
            "edges_per_sec": round(self.edges_per_sec, 1),
            "graphs_per_sec": round(self.graphs_per_sec, 3),
            "steps_per_sec": round(self.steps_per_sec, 3),
        })
