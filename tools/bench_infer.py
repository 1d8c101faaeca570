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

if os.environ.get("TM_CPU"):  # CPU smoke runs
    jax.config.update("jax_platforms", "cpu")

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


def bench_torch_serving(seqs):
    """Reference-pattern CPU torch serving cost: sequences one at a time
    (the reference hard-asserts batch 1, graph.py:117), per-timestep sparse-mm
    forward over the live window rows.  Charitable: adjacencies prebuilt,
    no losses, no decode charged (ours includes host planning + decode), so
    the reported ratio UNDERSTATES the real gap.  Graph sizes come from the
    teacher-forced schedule of the same sequences — the same rolling-window
    mechanics inference runs (ref infer.py:49-84)."""
    import torch

    from trackmpnn_tpu.graph.schedule import build_window_schedule

    torch.set_num_threads(os.cpu_count() or 8)
    H = 64
    F = seqs[0][0].shape[1]
    lin1 = torch.nn.Linear(F, H)
    bn = torch.nn.BatchNorm1d(H).eval()
    lin2 = torch.nn.Linear(H, H)
    edge_gru = torch.nn.GRUCell(H, H)
    node_gru = torch.nn.GRUCell(H, H)
    w_node = torch.nn.Linear(H, 1)
    w_edge = torch.nn.Linear(H, 1)

    plans = []
    total_frames = 0
    for feats, y_seq in seqs:
        ws = build_window_schedule(feats.astype(np.float32), y_seq)
        if ws is None:
            continue
        total_frames += int(y_seq[:, 0].max()) + 1
        n = ws.n_rows
        sidx = np.arange(n)
        per_step = []
        for s in range(ws.n_steps):
            na = int(ws.n_after[s])
            rows = np.arange(n) < na
            er = np.where(~ws.is_det[:n] & rows)[0]
            src = np.concatenate([er, er])
            dst = np.concatenate([ws.past[er], ws.fut[er]])
            val = np.concatenate([np.ones(len(er)), -np.ones(len(er))])
            node_adj = torch.sparse_coo_tensor(
                np.stack([src, dst]), torch.tensor(val, dtype=torch.float32),
                (n, n)).coalesce()
            edge_adj = torch.sparse_coo_tensor(
                np.stack([dst, src]), torch.tensor(val, dtype=torch.float32),
                (n, n)).coalesce()
            per_step.append((node_adj, edge_adj, torch.tensor(rows), na,
                             int(ws.n_before[s])))
        fixed = (torch.tensor(ws.feat[:n]), torch.tensor(ws.is_det[:n]))
        plans.append((fixed, per_step))

    t0 = time.perf_counter()
    with torch.no_grad():
        for (feat, is_det), per_step in plans:
            n = feat.shape[0]
            h = None
            for node_adj, edge_adj, live, na, nb in per_step:
                x_new = feat[nb:na]
                if x_new.shape[0] > 0:
                    xt = lin2(torch.relu(bn(lin1(x_new))))
                    upd = torch.zeros((na - nb, H))
                    det_new = is_det[nb:na]
                    upd[det_new] = xt[det_new]
                else:
                    upd = torch.zeros((0, H))
                h = upd if h is None else torch.cat([h, upd], 0)
                hp = torch.cat([h, torch.zeros((n - h.shape[0], H))], 0)
                ns = torch.sparse.mm(node_adj, hp)
                e_out = edge_gru(ns, hp)
                es = torch.sparse.mm(edge_adj, hp)
                n_out = node_gru(es, hp)
                h_full = torch.where(is_det[:, None], n_out, e_out)
                h_full = torch.where(live[:, None], h_full, torch.zeros(1))
                y = torch.where(is_det[:, None], w_node(h_full),
                                w_edge(h_full))[:, 0]
                _ = torch.sigmoid(y)
                h = h_full[:na]
    dt = time.perf_counter() - t0
    return total_frames / dt


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
        # warmup/compile both modes (cohort split changes the bucketed caps)
        tracker.run(seqs, pipeline=False)
        tracker.run(seqs, pipeline=True)
        # lockstep (one cohort) vs pipelined (two cohorts double-buffered:
        # host planner/decode overlaps the in-flight device forward)
        modes = {}
        for name, pipe in (("lockstep", False), ("pipelined", True)):
            t0 = time.perf_counter()
            tracker.run(seqs, pipeline=pipe)
            modes[name] = time.perf_counter() - t0
        dt = min(modes.values())
        results[k] = {"frames_per_s": frames / dt, "dets_per_s": dets / dt,
                      "wall_s": dt,
                      "lockstep_frames_per_s": frames / modes["lockstep"],
                      "pipelined_frames_per_s": frames / modes["pipelined"]}
        print(f"K={k}: lockstep {frames/modes['lockstep']:.1f} f/s, "
              f"pipelined {frames/modes['pipelined']:.1f} f/s, "
              f"{dets/dt:.0f} dets/s best", flush=True)
    base_fps = bench_torch_serving(make_seqs(max(KS)))
    results["torch_baseline_frames_per_s"] = base_fps
    print(f"torch serving baseline: {base_fps:.1f} frames/s "
          f"(forward-only, no decode charged)", flush=True)
    for k in KS:
        results[k]["vs_baseline"] = results[k]["frames_per_s"] / base_fps
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
