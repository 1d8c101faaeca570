"""On-chip A/B of the block train step: XLA round vs fused Pallas round.

Times the FULL loss-bearing train step (bench.py's exact configuration:
B=8 windows, 2d feats, nhidden 64, tp_classifier off, Adam) in four
variants {XLA, fused-Pallas} x {f32, bf16}, device-trace timed (wall clock
through the tunnel is untrustworthy, utils/devicetime.py).  The step
mutates params each call, so repeat inputs vary and cannot be memoized.

Run ONE at a time: nohup python tools/bench_fused_block.py > /tmp/bench_fblock.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # warm tunnel compiles across runs

import bench
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.block import build_block_batch, make_block_train_step
from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

NSTEPS = int(os.environ.get("NSTEPS", "8"))


def main():
    print("devices:", jax.devices(), flush=True)
    schedules, cap, t_cap = bench.build_workload()
    edges = sum(bench.live_edges_per_window(w) for w in schedules)
    bb = build_block_batch(schedules, t_cap)
    print(f"workload: B={len(schedules)} cap={cap} t_cap={t_cap} "
          f"edges={edges} rect={bb.edge_label.shape}", flush=True)

    results = {}
    for fused in (False, True):
        for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
            params = mpnn.init_params(jax.random.key(0), cfg)
            stats = mpnn.init_batch_stats(cfg)
            tx = optim.make_optimizer(1e-4, 5e-4)
            opt = tx.init(params)
            step = make_block_train_step(cfg, tx, tp_classifier=False,
                                         compute_dtype=dt, fused=fused)
            state = [params, stats, opt]

            def one():
                state[0], state[1], state[2], loss, _ = step(
                    state[0], state[1], state[2], bb)
                return loss

            loss = jax.block_until_ready(one())
            print(f"fused={fused} {dt_name}: warmup loss {float(loss):.9f}",
                  flush=True)
            sec = device_seconds_per_step(one, n=NSTEPS)
            eps = edges / sec
            results[f"fused={fused},{dt_name}"] = (sec * 1e3, eps / 1e6)
            print(f"fused={fused} {dt_name}: {sec*1e3:.2f} ms/step, "
                  f"{eps/1e6:.2f}M edges/s, loss {float(one()):.6f}",
                  flush=True)

    print(json.dumps({k: {"ms": round(v[0], 2), "Meps": round(v[1], 2)}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
