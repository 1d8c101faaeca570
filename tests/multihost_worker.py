"""Worker process for the real multi-process distributed test
(test_multihost.py).  Each process owns 4 virtual CPU devices (XLA_FLAGS
set by the spawning test); `jax.distributed.initialize` joins them into
one 8-device global mesh and the production sharded block step runs on a
deterministic workload.  Process-local results land in TM_MH_OUT/p{i}.npz
for the parent to compare against the single-process run.

Also importable: `build_workload()` is shared with the parent test so
both sides construct bit-identical inputs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B_WINDOWS = 8
TRACKS = 4
FRAMES = 4
SEED0 = 7


def build_workload():
    """B deterministic tiny window schedules -> (BlockBatch, t_cap)."""
    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.train.block import build_block_batch

    raw, s = [], 0
    while len(raw) < B_WINDOWS:
        feats, bp, _ = make_sequence(num_tracks=TRACKS, num_frames=FRAMES,
                                     seed=SEED0 + s, miss_rate=0.05,
                                     fp_rate=0.1)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64))
        if ws is not None:
            raw.append(ws)
        s += 1
    t_cap = max(w.n_steps for w in raw)
    return build_block_batch(raw, t_cap)


def run_step_on_mesh(mesh, bb, globalize=None):
    """One production sharded train step; returns (params, loss) pytree.

    `globalize(leaf, pspec)` maps a host-local numpy leaf to a device
    array on `mesh` — identity-ish single-process, make_array_from_callback
    multi-process.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.parallel.block_parallel import (BLOCK_SPECS,
                                                       make_sharded_block_step)

    if globalize is None:
        def globalize(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    # SGD, not the production Adam: post-step params are then a LINEAR map
    # of the psum'd gradients, so gradient-fidelity across processes is
    # testable with allclose.  (Adam divides by sqrt(v): on near-zero-grad
    # leaves, gloo-vs-in-process reduction-order noise flips update signs.)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    repl = P()
    rep = lambda tree: jax.tree_util.tree_map(
        lambda x: globalize(np.asarray(x), repl), tree)
    params, stats, opt_state = rep(params), rep(stats), rep(opt_state)
    bb = jax.tree_util.tree_map(
        lambda x, spec: globalize(np.asarray(x), spec), bb, BLOCK_SPECS)

    step = make_sharded_block_step(mesh, cfg, tx, tp_classifier=False,
                                   compute_dtype=jnp.float32, fused=False)
    params, stats, opt_state, loss, aux = step(params, stats, opt_state, bb)
    jax.block_until_ready(loss)
    return params, float(jax.device_get(loss))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from trackmpnn_tpu.parallel.multihost import (initialize_multihost,
                                                  is_primary,
                                                  local_batch_slice)

    info = initialize_multihost()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == 8, info

    # exercised for coverage: every host computes its input slice even
    # though this test feeds the global batch through a callback
    sl = local_batch_slice(B_WINDOWS)
    assert (sl.stop - sl.start) * nproc == B_WINDOWS

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    bb = build_workload()

    def globalize(x, spec):
        from jax.sharding import NamedSharding

        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    params, loss = run_step_on_mesh(mesh, bb, globalize)

    out = os.path.join(os.environ["TM_MH_OUT"], f"p{info['process_index']}.npz")
    leaves, _ = jax.tree_util.tree_flatten(params)
    np.savez(out, loss=np.float32(loss), primary=np.bool_(is_primary()),
             **{f"leaf{i}": np.asarray(jax.device_get(l))
                for i, l in enumerate(leaves)})

    # barrier so no process exits while a peer still needs collectives
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("trackmpnn-multihost-done")
    print("WORKER_OK", info["process_index"], loss, flush=True)


if __name__ == "__main__":
    main()
