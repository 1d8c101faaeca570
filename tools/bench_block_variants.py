"""On-chip sweep of block-step knobs: remat on/off, kernel grid G.

With the fused round, scan-level remat trades cheap HBM residual streaming
for kernel recompute — possibly a net loss now.  Times the full train step
per variant (device trace; varying params via the Adam update).

Run ONE at a time: nohup python tools/bench_block_variants.py > /tmp/bench_bvar.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # warm tunnel compiles across runs

import bench
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.ops import pallas_block
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.block import build_block_batch, make_block_train_step
from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

NSTEPS = int(os.environ.get("NSTEPS", "8"))


def time_variant(bb, edges, *, fused, remat, g=None, dt=jnp.bfloat16):
    if g is not None:
        pallas_block.DEFAULT_G = g
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4, 5e-4)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, tp_classifier=False,
                                 compute_dtype=dt, fused=fused, remat=remat)
    state = [params, stats, opt]

    def one():
        state[0], state[1], state[2], loss, _ = step(state[0], state[1],
                                                     state[2], bb)
        return loss

    try:
        jax.block_until_ready(one())
        sec = device_seconds_per_step(one, n=NSTEPS)
    except Exception as e:  # noqa: BLE001 (VMEM OOM variants report and move on)
        print(f"fused={fused} remat={remat} G={g}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        return
    print(f"fused={fused} remat={remat} G={g}: {sec*1e3:.2f} ms/step, "
          f"{edges/sec/1e6:.2f}M edges/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    schedules, cap, t_cap = bench.build_workload()
    edges = sum(bench.live_edges_per_window(w) for w in schedules)
    bb = build_block_batch(schedules, t_cap)

    time_variant(bb, edges, fused=True, remat=True, g=4)    # current default
    time_variant(bb, edges, fused=True, remat=False, g=4)
    time_variant(bb, edges, fused=True, remat=True, g=2)
    time_variant(bb, edges, fused=True, remat=False, g=2)
    time_variant(bb, edges, fused=True, remat=False, g=8)   # fwd-only G=8?
    time_variant(bb, edges, fused=False, remat=False)       # XLA, no remat


if __name__ == "__main__":
    main()
