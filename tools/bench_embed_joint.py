"""BASELINE config 5 on-chip: the FULL joint embed-training step at KITTI
shapes — backbone forward+backward + FairMOT id loss + Adam (train/embed.py)
plus the tracker block step — for both embed nets.

Also times the dla34 DCN alternatives end-to-end (not per-layer like
tools/bench_deform.py): shift-warp (default, dcn_max_offset=2) vs the exact
bound-free gather path (dcn_max_offset=None), to settle the
DCN-backward-kernel vs scan-VJP decision with a whole-step number.

Reference recipe being matched: /root/reference/dataset/kitti_mot.py:119-132
(embed net + its own Adam inside the dataset, stepped per chunk).

Run ONE at a time: nohup python tools/bench_embed_joint.py > logs/bench_embed_joint.log 2>&1 &
Env: EJ_HW (default "384,1280"), EJ_FRAMES (5), EJ_DETS (64), NSTEPS (5).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("TM_CPU"):  # CPU smoke: correctness, wall-clock timed
    jax.config.update("jax_platforms", "cpu")

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # no-op on cpu (utils/cache.py)

import jax.numpy as jnp

from trackmpnn_tpu.train.embed import EmbedTrainer
from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

HW = tuple(int(x) for x in os.environ.get("EJ_HW", "384,1280").split(","))
FRAMES = int(os.environ.get("EJ_FRAMES", 5))
DETS = int(os.environ.get("EJ_DETS", 64))  # dets per chunk (~13/frame)
NSTEPS = int(os.environ.get("NSTEPS", 5))


def bench_embed_step(arch, **kw):
    tr = EmbedTrainer(arch=arch, input_hw=HW, max_dets=DETS, **kw)
    t_cap = max(((FRAMES + 3) // 4) * 4, 4)
    rng0 = np.random.default_rng(0)
    images = jnp.asarray(rng0.normal(size=(t_cap, HW[0], HW[1], 3))
                         .astype(np.float32))
    hm, wm = HW[0] // tr.down_ratio, HW[1] // tr.down_ratio
    fr_of = jnp.asarray(rng0.integers(0, FRAMES, DETS).astype(np.int32))
    cy = jnp.asarray(rng0.integers(0, hm, DETS).astype(np.int32))
    cx = jnp.asarray(rng0.integers(0, wm, DETS).astype(np.int32))
    tids = jnp.asarray((np.arange(DETS) % 16).astype(np.int32))
    valid = jnp.ones(DETS, bool)
    state = [tr.params, tr.opt_state, jax.random.key(1)]

    def one():
        state[2], rng = jax.random.split(state[2])
        state[0], state[1], loss, feats = tr._step(
            state[0], state[1], images, fr_of, cy, cx, tids, valid, rng)
        return loss

    loss = one()
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss)), f"{arch} embed loss diverged"
    if jax.default_backend() == "tpu":
        sec = device_seconds_per_step(one, n=NSTEPS)
    else:
        import time

        t0 = time.perf_counter()
        for _ in range(NSTEPS):
            loss = one()
        jax.block_until_ready(loss)
        sec = (time.perf_counter() - t0) / NSTEPS
    return sec


def bench_tracker_step():
    import bench
    from trackmpnn_tpu.train.block import build_block_batch

    bench.B, bench.TRACKS, bench.FRAMES = 1, 16, FRAMES
    schedules, cap, t_cap = bench.build_workload()
    on_tpu = jax.default_backend() == "tpu"
    return bench.bench_ours(schedules, cap, t_cap, on_tpu=on_tpu)


def main():
    print("devices:", jax.devices(), "HW:", HW, "frames:", FRAMES,
          "dets:", DETS, flush=True)
    rows = {}
    rows["espv2"] = bench_embed_step("espv2")
    print(f"espv2 embed step: {rows['espv2']*1e3:.1f} ms", flush=True)
    rows["dla34-shift(R=2)"] = bench_embed_step("dla34", dcn_max_offset=2.0)
    print(f"dla34 shift-warp embed step: {rows['dla34-shift(R=2)']*1e3:.1f} ms",
          flush=True)
    # The exact-gather DCN cannot run the joint step unchunked at these
    # shapes: its backward holds ~20 [T,Hm,Wm,9,C] gather temps = 65 GB HBM
    # on a 16 GB chip (measured 2026-08-18).  frame_chunk=N bounds the live
    # temps to one N-frame chunk via a checkpointed lax.map (train/embed.py).
    gc = int(os.environ.get("EJ_GATHER_CHUNK", "1"))
    rows["dla34-gather"] = bench_embed_step("dla34", dcn_max_offset=None,
                                            frame_chunk=gc)
    print(f"dla34 exact-gather embed step (frame_chunk={gc}): "
          f"{rows['dla34-gather']*1e3:.1f} ms", flush=True)
    rows["tracker(B=1)"] = bench_tracker_step()
    print(f"tracker block step (B=1 window): {rows['tracker(B=1)']*1e3:.1f} ms",
          flush=True)
    for arch in ("espv2", "dla34-shift(R=2)", "dla34-gather"):
        tot = rows[arch] + rows["tracker(B=1)"]
        print(f"JOINT {arch}: {tot*1e3:.1f} ms/chunk "
              f"({FRAMES} frames -> {FRAMES/tot:.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
