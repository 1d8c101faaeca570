"""Scaling-efficiency harness: edges/s at 1..N devices (and hosts).

BASELINE.md asks for edges/s measured at 1 chip, 1 host, and N>=2 hosts
with >=80% scaling efficiency.  This harness runs the SPMD train step on
growing sub-meshes of whatever devices exist (real TPU slices in
production; the forced-host CPU mesh in tests - where the numbers validate
the mechanics, not the hardware) and reports per-device efficiency.

Usage:  python -m trackmpnn_tpu.parallel.scaling_bench [--devices 1 2 4 8]
"""

from __future__ import annotations

import json
import time
from typing import List

import numpy as np


def build_batch(n_windows: int, cap: int = 1024, t_cap: int = 12,
                tracks: int = 8, frames: int = 10):
    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule

    out, s = [], 0
    while len(out) < n_windows:
        feats, bp, _ = make_sequence(num_tracks=tracks, num_frames=frames,
                                     seed=200 + s, miss_rate=0.05, fp_rate=0.1)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64),
                                   cap=cap, t_cap=t_cap)
        if ws is not None:
            out.append(ws)
        s += 1
    return out


def measure(device_counts: List[int], windows_per_device: int = 2,
            repeats: int = 10, nhidden: int = 64) -> dict:
    import jax

    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.parallel import batch_schedules, make_mesh, make_sharded_train_step
    from trackmpnn_tpu.train import optim

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=nhidden)
    tx = optim.make_optimizer(1e-4)

    results = {}
    for nd in device_counts:
        if nd > len(jax.devices()):
            continue
        schedules = build_batch(nd * windows_per_device)
        edges = sum(_live_edges(ws) for ws in schedules)
        sbatch = batch_schedules(schedules, 1024, 12)
        mesh = make_mesh({"data": nd}, jax.devices()[:nd])
        params = mpnn.init_params(jax.random.key(0), cfg)
        stats = mpnn.init_batch_stats(cfg)
        opt_state = tx.init(params)
        step = make_sharded_train_step(mesh, cfg, tx, True)
        params, stats, opt_state, loss, _ = step(params, stats, opt_state, sbatch)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(repeats):
            params, stats, opt_state, loss, _ = step(params, stats, opt_state, sbatch)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / repeats
        results[nd] = {"edges_per_sec": edges / dt, "step_ms": dt * 1000}

    base = None
    for nd in sorted(results):
        eps = results[nd]["edges_per_sec"]
        if base is None:
            base = eps / nd
        results[nd]["efficiency"] = eps / (nd * base)
    return results


def _live_edges(ws) -> int:
    edge_pos = np.where(~ws.is_det[: ws.n_rows])[0]
    return int(sum(np.sum(edge_pos < ws.n_after[s]) for s in range(ws.n_steps)))


def main(argv=None):
    import argparse

    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--repeats", type=int, default=10)
    args = p.parse_args(argv)
    counts = args.devices
    if counts is None:
        counts, c = [], 1
        while c <= len(jax.devices()):
            counts.append(c)
            c *= 2
    res = measure(counts, repeats=args.repeats)
    print(json.dumps(res, indent=2, default=float))
    return res


if __name__ == "__main__":
    main()
