"""Explicit time-axis shard_map forward == unsharded model, on the
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.parallel import make_mesh
from trackmpnn_tpu.parallel.time_shard import make_time_sharded_forward


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_time_sharded_forward_matches(n_shards):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    # perturb so the math is nontrivial
    params = jax.tree_util.tree_map(
        lambda l: l + 0.3 * jax.random.normal(jax.random.key(1), l.shape), params)
    stats = mpnn.init_batch_stats(cfg)

    feats, bp, _ = make_sequence(num_tracks=4, num_frames=6, seed=3)
    ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), bucket=n_shards * 32)
    cap = len(ws.is_det)
    assert cap % n_shards == 0

    mesh = make_mesh({"time": n_shards}, jax.devices()[:n_shards])
    fwd = make_time_sharded_forward(mesh, cfg)

    idx = np.arange(cap)
    h = 0.1 * np.asarray(
        jax.random.normal(jax.random.key(2), (cap, len(cfg.branches) * cfg.nhidden)))
    for step in [0, ws.n_steps - 1]:
        live = idx < ws.n_after[step]
        new = (idx >= ws.n_before[step]) & live
        g = GraphView(is_det=jnp.asarray(ws.is_det), past=jnp.asarray(ws.past),
                      fut=jnp.asarray(ws.fut), live=jnp.asarray(live),
                      new=jnp.asarray(new), feat=jnp.asarray(ws.feat))
        h_in = jnp.asarray(h) * (step + 1)
        out, stats_ref = mpnn.forward(params, stats, cfg, g, h_in, train=True)

        scores, logits, h_out, stats_sh = fwd(
            params, stats, g.is_det, g.past, g.fut, g.live, g.new, g.feat, h_in)

        np.testing.assert_allclose(np.asarray(logits), np.asarray(out.logits),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_out), np.asarray(out.hidden),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(stats_sh["branches"]),
                        jax.tree_util.tree_leaves(stats_ref["branches"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
