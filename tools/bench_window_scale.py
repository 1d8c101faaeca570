"""BASELINE config 4 done properly: window-scale stress on the TRAINING side.

For cur-win-size in {5, 10, 20}:
  * trains on a synthetic KITTI tree via the production CLI (block fast
    path) and reports the final validation MOTA / F1;
  * reports the block layout's padding efficiency at that window (live
    rectangle cells / padded cells, live det rows / capD rows) — the
    rectangles are na_cap x nt_cap per step (train/block.py:88-96), so
    this is the design's exposure as the window grows;
  * times the block train step at bench shapes per window size (device
    trace on TPU, wall clock on CPU).

Reference window mechanism being stressed: /root/reference/train.py:255-260
(rolling window advance) and utils/graph.py:281 (per-step bipartite block).

Usage: python tools/bench_window_scale.py [--skip-train] [--skip-time]
Env: WS_TRACKS (16), WS_EPOCHS (3), WS_B (8), WS_CPU=1 forces cpu backend.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

TRACKS = int(os.environ.get("WS_TRACKS", 16))
EPOCHS = int(os.environ.get("WS_EPOCHS", 3))
B = int(os.environ.get("WS_B", 8))
WINDOWS = (5, 10, 20)


def make_schedules(win, b, tracks=TRACKS, cap=None, t_cap=None):
    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule

    out, s = [], 0
    while len(out) < b:
        feats, bp, _ = make_sequence(num_tracks=tracks, num_frames=win + 1,
                                     seed=100 + s, miss_rate=0.05, fp_rate=0.1)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64),
                                   cap=cap, t_cap=t_cap)
        if ws is not None:
            out.append(ws)
        s += 1
    return out


def padding_stats(scheds):
    from trackmpnn_tpu.train.block import block_dims

    capD, na_cap, nt_cap = block_dims(scheds)
    t_cap = max(w.n_steps for w in scheds)
    live_cells = live_det = 0
    for ws in scheds:
        live_det += int(np.sum(ws.is_det[: ws.n_rows]))
        for blk in ws.blocks:
            if blk is not None:
                live_cells += blk.na * blk.nt
    padded = len(scheds) * t_cap * na_cap * nt_cap
    return {
        "capD": capD, "na_cap": na_cap, "nt_cap": nt_cap, "t_cap": t_cap,
        "cell_efficiency": round(live_cells / padded, 3),
        "det_fill": round(live_det / (len(scheds) * capD), 3),
        "live_edges": live_cells,
    }


def time_block_step(scheds, on_tpu):
    import jax
    import jax.numpy as jnp

    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train import optim
    from trackmpnn_tpu.train.block import build_block_batch, make_block_train_step

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4, 5e-4)
    opt_state = tx.init(params)
    step = make_block_train_step(
        cfg, tx, tp_classifier=False,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32, fused=on_tpu,
        defer_loss=on_tpu)
    t_cap = max(w.n_steps for w in scheds)
    bb = build_block_batch(scheds, t_cap)
    state = [params, stats, opt_state]

    def one():
        state[0], state[1], state[2], loss, _ = step(state[0], state[1],
                                                     state[2], bb)
        return loss

    jax.block_until_ready(one())
    if on_tpu:
        from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

        return device_seconds_per_step(one, n=10)
    t0 = time.perf_counter()
    for _ in range(5):
        loss = one()
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / 5


def train_at_window(win):
    from test_datasets import write_kitti_tree

    from trackmpnn_tpu.cli import train as cli_train

    root = tempfile.mkdtemp() + "/kitti"
    # the KITTI split (data/kitti.py) indexes 21 training sequences
    write_kitti_tree(root, num_seqs=21, frames=win + 6)
    out = tempfile.mkdtemp() + "/exp"
    cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", str(win),
        "--epochs", str(EPOCHS), "--num-hidden-feats", "32",
        "--batch-windows", "2",
        # small synthetic tree: the quick-convergence recipe the e2e tests
        # use (the reference lr 1e-4 needs its 50-epoch schedule)
        "--learning-rate", os.environ.get("WS_LR", "3e-3"),
    ])
    log = open(out + "/logs.txt").read()
    mota = f1 = None
    for line in log.splitlines():
        # best across epochs = the reference's model-selection criterion
        if line.startswith("Validation MOTA ="):
            v = float(line.split("=")[1].strip().rstrip("%"))
            mota = v if mota is None else max(mota, v)
        if line.startswith("Validation F1 score ="):
            v = float(line.split("=")[1].strip())
            f1 = v if f1 is None else max(f1, v)
    return {"mota": mota, "f1": f1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-time", action="store_true")
    args = ap.parse_args()

    import jax

    if os.environ.get("WS_CPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        from trackmpnn_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"

    results = {}
    for win in WINDOWS:
        scheds = make_schedules(win, B)
        row = padding_stats(scheds)
        if not args.skip_time:
            dt = time_block_step(scheds, on_tpu)
            row["ms_per_step"] = round(dt * 1e3, 2)
            row["edges_per_sec"] = round(row["live_edges"] / dt)
        if not args.skip_train:
            row.update(train_at_window(win))
        row["backend"] = jax.default_backend()
        results[win] = row
        print(f"win={win}: {json.dumps(row)}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
