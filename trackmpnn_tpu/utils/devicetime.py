"""Trustworthy step timing on the tunneled TPU backend.

Wall-clock timing through the axon tunnel is unreliable: repeat calls on
the same executable can return in microseconds while the device trace
shows tens of milliseconds of real work per step (`block_until_ready`
appears to complete on enqueue, and identical executions may be replayed).
The only trustworthy number is the DEVICE-side timeline from
`jax.profiler.trace` (CLAUDE.md; confirmed again on 2026-08-17: wall said
0.35 ms/step where the trace showed 49.3 ms/step).

`device_seconds_per_step` runs `n` calls of a nullary step thunk under the
profiler and returns seconds/step from the device events.  On the CPU
backend plain wall time is accurate (and the profiler adds overhead), so
callers should only use this on non-CPU backends.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax


def _device_us_per_program(trace_dir: str, min_events: int = 1) -> float:
    """Total duration of top-level jitted program executions, in us.

    Programs are the X-events on the "XLA Modules" thread of a /device:*
    process (individual fusions/ops nest on the "XLA Ops" thread inside
    them).  Identified via the trace's process/thread metadata - event
    *args* are not stable across profiler versions (the long_name arg this
    used to key on disappeared from module events on 2026-08-17)."""
    # per-device totals: devices execute a sharded program CONCURRENTLY,
    # so summing across device pids would overstate s/step by the device
    # count - the program time is the max over devices
    per_dev = collections.Counter()
    per_dev_n = collections.Counter()
    for f in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            events = json.load(fh).get("traceEvents", [])
        dev_pids = {e.get("pid") for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and str((e.get("args") or {}).get("name", "")
                            ).startswith("/device:")}
        mod_tracks = {(e.get("pid"), e.get("tid")) for e in events
                      if e.get("ph") == "M" and e.get("name") == "thread_name"
                      and e.get("pid") in dev_pids
                      and (e.get("args") or {}).get("name") == "XLA Modules"}
        for e in events:
            if (e.get("ph") == "X" and "dur" in e
                    and (e.get("pid"), e.get("tid")) in mod_tracks):
                per_dev[e.get("pid")] += e["dur"]
                per_dev_n[e.get("pid")] += 1
    if not per_dev or max(per_dev.values()) == 0:
        # Large programs (e.g. whole-backbone embed steps) come back with
        # the XLA Modules/Ops threads present but EMPTY on this profiler
        # (observed 2026-08-18: the device "Steps" thread showed 9.5 s of
        # real execution while Modules totalled 0) - treat as missing.
        raise RuntimeError(f"no device program events found in {trace_dir}")
    pid = max(per_dev, key=per_dev.get)
    if per_dev_n[pid] < min_events:
        # n executed steps must leave >= n module events; fewer means the
        # profiler dropped the main program's events and whatever remains
        # is an auxiliary program (would under-report wildly).
        raise RuntimeError(
            f"only {per_dev_n[pid]} module events for {min_events} steps "
            f"in {trace_dir} - profiler dropped the main program")
    return max(per_dev.values())


def device_seconds_per_step(step_thunk, n: int = 5) -> float:
    """Run `step_thunk` n times under the profiler; return device s/step.

    step_thunk() must perform exactly one jitted training/eval step and
    return a value to block on."""
    trace_dir = tempfile.mkdtemp(prefix="tm_devtime_")
    try:
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(n):
                out = step_thunk()
            # device_get, NOT block_until_ready: through the tunnel the
            # latter can complete on enqueue, closing the trace before the
            # device ran anything (observed 2026-08-18: embed bench traced
            # 0.0 ms/step).  A host copy cannot be faked - the bytes only
            # exist after execution.
            jax.device_get(out)
        try:
            return _device_us_per_program(trace_dir, min_events=n) / n / 1e6
        except RuntimeError:
            pass
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    # Fallback when the profiler drops module events (large programs):
    # wall-clock over n CHAINED steps with one final device_get.  The steps
    # chain through their outputs, so the final host copy forces every step
    # to have really executed; per-step cost then includes one amortized
    # round trip (an upper bound on device time, unlike bare
    # block_until_ready wall timing which can be ~100x UNDER).
    import sys
    import time

    print("devicetime: no module events in trace, falling back to "
          "chained-wall timing", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = step_thunk()
    jax.device_get(out)
    return (time.perf_counter() - t0) / n
