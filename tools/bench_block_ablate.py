"""Ablation timing: apportion the fused block step between the GRU round
and the loss side (targets+CE+BCE+f1), by stubbing the loss internals.

BENCH-ONLY monkeypatching — never a production config.  Run ONE at a time:
nohup python tools/bench_block_ablate.py > /tmp/bench_abl.log 2>&1 &
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
from trackmpnn_tpu.train import block as B
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

NSTEPS = int(os.environ.get("NSTEPS", "8"))


def time_step(bb, edges, label):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4, 5e-4)
    opt = tx.init(params)
    step = B.make_block_train_step(cfg, tx, tp_classifier=False,
                                   compute_dtype=jnp.bfloat16, fused=True)
    state = [params, stats, opt]

    def one():
        state[0], state[1], state[2], loss, _ = step(state[0], state[1],
                                                     state[2], bb)
        return loss

    jax.block_until_ready(one())
    sec = device_seconds_per_step(one, n=NSTEPS)
    print(f"{label}: {sec*1e3:.2f} ms/step, {edges/sec/1e6:.2f}M edges/s",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    schedules, cap, t_cap = bench.build_workload()
    edges = sum(bench.live_edges_per_window(w) for w in schedules)
    bb = B.build_block_batch(schedules, t_cap)

    time_step(bb, edges, "full")

    real_tce = B._block_targets_and_ce

    def stub_tce(logits_d, logits_e, bb_, det_live, blk_live, row_m, col_m,
                 em3):
        t_d = jnp.zeros_like(logits_d, jnp.int32)
        t_e = jnp.zeros_like(logits_e, jnp.int32)
        # keep a grad path through logits so backward shape matches intent
        return t_d, t_e, 1e-6 * (jnp.sum(logits_e) + jnp.sum(logits_d))

    B._block_targets_and_ce = stub_tce
    time_step(bb, edges, "no targets+CE")

    real_bce = B._per_window_bce_dual
    B._per_window_bce_dual = (
        lambda sd, td, md, se, te, me, nw: 1e-6 * jnp.sum(se))
    time_step(bb, edges, "no targets+CE, no BCE")

    B._block_targets_and_ce = real_tce
    time_step(bb, edges, "no BCE only")
    B._per_window_bce_dual = real_bce


if __name__ == "__main__":
    main()
