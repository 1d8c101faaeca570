"""Serving-throughput bench: batched rolling-window inference on TPU.

Tracks K synthetic sequences in lockstep through decode/batch_tracker
(one vmapped device forward per global step, host C++ planner between
steps) and reports frames/s and detections/s at several batch widths.
Unlike the train bench, wall clock is the right metric here - every step
PULLS scores/hidden back to host (real transfers, cannot complete on
enqueue), and the host planning is part of the serving cost.

Run ONE at a time: nohup python tools/bench_infer.py > /tmp/bench_infer.log 2>&1 &
Env: K widths via INFER_K="1 8 32", sequence shape via INFER_TRACKS/FRAMES.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # warm tunnel compiles across runs

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.decode.batch_tracker import BatchedTracker
from trackmpnn_tpu.decode.tracker import TrackerConfig
from trackmpnn_tpu.models import mpnn

KS = [int(x) for x in os.environ.get("INFER_K", "1 4 16").split()]
TRACKS = int(os.environ.get("INFER_TRACKS", "16"))
FRAMES = int(os.environ.get("INFER_FRAMES", "30"))


def make_seqs(k):
    out = []
    for s in range(k):
        feats, bp, _ = make_sequence(num_tracks=TRACKS, num_frames=FRAMES,
                                     seed=1000 + s, miss_rate=0.05,
                                     fp_rate=0.1)
        out.append((feats.astype(np.float32), bp[:, :2].astype(np.int64)))
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    mc = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), mc)
    stats = mpnn.init_batch_stats(mc)
    tc = TrackerConfig(cur_win_size=5, ret_win_size=0, tp_classifier=True,
                       hungarian=False)
    results = {}
    for k in KS:
        seqs = make_seqs(k)
        dets = sum(x.shape[0] for x, _ in seqs)
        frames = k * FRAMES
        tracker = BatchedTracker(params, stats, mc, tc)
        tracker.run(seqs)  # warmup/compile (buckets)
        t0 = time.perf_counter()
        tracker.run(seqs)
        dt = time.perf_counter() - t0
        results[k] = {"frames_per_s": frames / dt, "dets_per_s": dets / dt,
                      "wall_s": dt}
        print(f"K={k}: {frames/dt:.1f} frames/s, {dets/dt:.0f} dets/s "
              f"({dt:.2f}s for {frames} frames)", flush=True)
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
