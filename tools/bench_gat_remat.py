"""GAT remat A/B: the fused path defaults remat=False (the round kernel's
VJP leaves nothing big to stack), but GAT's attention chain is XLA and its
rectangle intermediates (ea/en/att per head per step) DO get stacked as
scan residuals when remat is off — the NATT=1 profile shows +11.8 ms/step
of XLA fusions over the no-GAT step (logs/profile_gat1.log).  This times
GAT 1/3-head with remat off vs on to set the per-config default.

Run ONE at a time: nohup python tools/bench_gat_remat.py > logs/bench_gat_remat.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TM_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from tools.bench_r3 import NSTEPS, workload  # noqa: E402
from trackmpnn_tpu.models import mpnn  # noqa: E402
from trackmpnn_tpu.train import optim  # noqa: E402
from trackmpnn_tpu.train.block import make_block_train_step  # noqa: E402
from trackmpnn_tpu.utils.devicetime import device_seconds_per_step  # noqa: E402


def time_gat(tag, bb, edges, *, heads, remat):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64,
                           nattheads=heads)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4, 5e-4)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, tp_classifier=False,
                                 compute_dtype=jnp.bfloat16, fused=True,
                                 defer_loss=True, remat=remat)
    state = [params, stats, opt]
    rng = jax.random.key(7)

    def one():
        state[0], state[1], state[2], loss, _ = step(state[0], state[1],
                                                     state[2], bb, rng)
        return loss

    try:
        jax.block_until_ready(one())
        if jax.default_backend() == "tpu":
            sec = device_seconds_per_step(one, n=NSTEPS)
        else:
            import time

            t0 = time.perf_counter()
            for _ in range(NSTEPS):
                loss = one()
            jax.block_until_ready(loss)
            sec = (time.perf_counter() - t0) / NSTEPS
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    print(f"{tag}: {sec*1e3:.2f} ms/step, {edges/sec/1e6:.2f}M edges/s",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    bb8, e8 = workload(8)
    for heads in (1, 3):
        for remat in (False, True):
            time_gat(f"B=8 GAT{heads} fused defer=ON remat={int(remat)}",
                     bb8, e8, heads=heads, remat=remat)


if __name__ == "__main__":
    main()
