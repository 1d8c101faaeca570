"""Serving K=1 latency breakdown (VERDICT r3 task #8).

Splits the ~30 ms/frame K=1 serving step into measured components:
  plan     host graph planning (engine.update/init, Hungarian, C++ planner)
  pack     numpy view packing/stacking
  dispatch upload + async program enqueue
  block    np.asarray(scores): device compute + score download + tunnel RTT
  decode   host decode_tracks/prune

plus two floors measured in the same process:
  rtt      dispatch+fetch of a trivial 1-element program (pure tunnel RTT)
  device   the actual K=1 forward program timed back-to-back with a single
           final fetch (amortizes RTT away -> device compute + enqueue rate)

Run ONE at a time: nohup python tools/profile_infer_k1.py > logs/profile_infer_k1.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TM_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.decode.batch_tracker import BatchedTracker, _batched_forward
from trackmpnn_tpu.decode.tracker import TrackerConfig
from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.models import mpnn

FRAMES = int(os.environ.get("INFER_FRAMES", "30"))
TRACKS = int(os.environ.get("INFER_TRACKS", "16"))
REPEATS = int(os.environ.get("REPEATS", "3"))


def measure_rtt(n=100):
    """Pure dispatch+fetch round-trip of a trivial program."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    np.asarray(f(x))  # compile
    t0 = time.perf_counter()
    for i in range(n):
        x = f(x)
        np.asarray(x)  # block every step, like the serving loop does
    return (time.perf_counter() - t0) / n


def measure_device_forward(params, stats, mc, cap=256, n=60):
    """The K=1 forward program, back-to-back with one final fetch: the
    chained dispatch amortizes the tunnel RTT away, leaving device compute
    + enqueue throughput (the floor serving could hit with perfect
    host/device overlap)."""
    rng = np.random.default_rng(0)
    nbh = len(mc.branches) * mc.nhidden
    is_det = np.zeros((1, cap), bool)
    is_det[:, ::3] = True
    past = rng.integers(0, cap, (1, cap)).astype(np.int32)
    fut = rng.integers(0, cap, (1, cap)).astype(np.int32)
    live = np.ones((1, cap), bool)
    new = np.zeros((1, cap), bool)
    new[:, -8:] = True
    feat = rng.normal(size=(1, cap, mc.nfeatures)).astype(np.float32)
    g = GraphView(is_det=jnp.asarray(is_det), past=jnp.asarray(past),
                  fut=jnp.asarray(fut), live=jnp.asarray(live),
                  new=jnp.asarray(new), feat=jnp.asarray(feat))
    h = jnp.zeros((1, cap, nbh), jnp.float32)
    scores, hidden = _batched_forward(params, stats, mc, g, h)
    np.asarray(scores)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        scores, hidden = _batched_forward(params, stats, mc, g, hidden)
    np.asarray(scores)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    mc = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), mc)
    stats = mpnn.init_batch_stats(mc)
    tc = TrackerConfig(cur_win_size=5, ret_win_size=0, tp_classifier=True,
                       hungarian=False)

    feats, bp, _ = make_sequence(num_tracks=TRACKS, num_frames=FRAMES,
                                 seed=1000, miss_rate=0.05, fp_rate=0.1)
    seqs = [(feats.astype(np.float32), bp[:, :2].astype(np.int64))]

    tracker = BatchedTracker(params, stats, mc, tc)
    tracker.run(seqs, pipeline=False)  # warm compile

    best = None
    for r in range(REPEATS):
        t0 = time.perf_counter()
        tracker.run(seqs, pipeline=False, profile=True)
        wall = time.perf_counter() - t0
        ph = dict(tracker.phase_s)
        n = tracker.n_steps
        row = {"wall_ms_per_frame": wall / FRAMES * 1e3,
               "steps": n,
               **{k: v / n * 1e3 for k, v in sorted(ph.items())}}
        print(f"run {r}: " + json.dumps(row, default=float), flush=True)
        if best is None or row["wall_ms_per_frame"] < best["wall_ms_per_frame"]:
            best = row

    rtt_ms = measure_rtt() * 1e3
    dev_ms = measure_device_forward(params, stats, mc) * 1e3
    print(f"tunnel RTT floor (1-elem program, blocked fetch): {rtt_ms:.2f} ms",
          flush=True)
    print(f"K=1 forward device+enqueue floor (chained, no per-step fetch): "
          f"{dev_ms:.2f} ms", flush=True)
    accounted = sum(v for k, v in best.items()
                    if k in ("plan", "pack", "dispatch", "block", "decode"))
    print(json.dumps({"best": best, "rtt_ms": rtt_ms,
                      "device_chained_ms": dev_ms,
                      "accounted_ms": accounted}, default=float), flush=True)


if __name__ == "__main__":
    main()
