"""Round-3 on-chip A/B sweep: the measurements VERDICT r2 asked for.

Times the FULL block train step (device trace) for:
  * deferred loss on/off (the dispatch-floor fix, train/block.py) at B=8;
  * B=16 recheck with the winning config;
  * GAT configs: fused score kernel (ops/pallas_gat.py) vs XLA attention;
  * edge-head fusion already defaults on via the round kernel — covered by
    fused on/off;

Prints one line per variant.  Run ONE at a time:
  nohup python tools/bench_r3.py > logs/bench_r3.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TM_CPU"):  # CPU smoke: every variant, wall-clock timed
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.block import build_block_batch, make_block_train_step
from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

NSTEPS = int(os.environ.get("NSTEPS", "10"))


def time_variant(tag, bb, edges, *, fused, defer, heads=0, dt=jnp.bfloat16,
                 rng=None):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64,
                           nattheads=heads)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4, 5e-4)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, tp_classifier=False,
                                 compute_dtype=dt, fused=fused,
                                 defer_loss=defer)
    state = [params, stats, opt]
    rng = jax.random.key(7) if heads else None

    def one():
        state[0], state[1], state[2], loss, _ = step(state[0], state[1],
                                                     state[2], bb, rng)
        return loss

    try:
        jax.block_until_ready(one())
        if jax.default_backend() == "tpu":
            sec = device_seconds_per_step(one, n=NSTEPS)
        else:  # CPU smoke runs (correctness of every variant, not timing)
            import time

            t0 = time.perf_counter()
            for _ in range(NSTEPS):
                loss = one()
            jax.block_until_ready(loss)
            sec = (time.perf_counter() - t0) / NSTEPS
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    print(f"{tag}: {sec*1e3:.2f} ms/step, {edges/sec/1e6:.2f}M edges/s",
          flush=True)
    return sec


def workload(b):
    os.environ["BENCH_B"] = str(b)
    bench.B = b
    schedules, cap, t_cap = bench.build_workload()
    edges = sum(bench.live_edges_per_window(w) for w in schedules)
    return build_block_batch(schedules, t_cap), edges


def main():
    print("devices:", jax.devices(), flush=True)
    bb8, e8 = workload(8)

    # 1) dispatch floor: deferred loss on/off (production fused config)
    time_variant("B=8 fused defer=off (r2 prod)", bb8, e8, fused=True,
                 defer=False)
    time_variant("B=8 fused defer=ON", bb8, e8, fused=True, defer=True)
    # XLA round also benefits from fewer launches?
    time_variant("B=8 xla defer=off", bb8, e8, fused=False, defer=False)
    time_variant("B=8 xla defer=ON", bb8, e8, fused=False, defer=True)

    # 2) B=16 recheck with the dispatch fix
    bb16, e16 = workload(16)
    time_variant("B=16 fused defer=ON", bb16, e16, fused=True, defer=True)
    time_variant("B=16 fused defer=off", bb16, e16, fused=True, defer=False)

    # 2b) edge-head fusion worth: round kernel's logit partials vs XLA head
    os.environ["TM_HEAD_XLA"] = "1"
    time_variant("B=8 fused defer=ON head=XLA", bb8, e8, fused=True,
                 defer=True)
    os.environ.pop("TM_HEAD_XLA")

    # 3) GAT: fused score kernel vs XLA attention (1 and 3 heads)
    for h in (1, 3):
        time_variant(f"B=8 GAT{h} fused(score krnl) defer=ON", bb8, e8,
                     fused=True, defer=True, heads=h)
        time_variant(f"B=8 GAT{h} xla defer=ON", bb8, e8, fused=False,
                     defer=True, heads=h)


if __name__ == "__main__":
    main()
