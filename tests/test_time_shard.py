"""Halo-exchange time-axis shard_map forward == unsharded model, on the
8-device CPU mesh; communication volume must scale with the boundary, not
the window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.parallel import make_mesh
from trackmpnn_tpu.parallel.time_shard import (
    build_halo_plan,
    make_time_sharded_forward,
    make_time_sharded_window,
)


def _setup(cfg, n_shards, seed=3, frames=6, tracks=4):
    params = mpnn.init_params(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        lambda l: l + 0.3 * jax.random.normal(jax.random.key(1), l.shape), params)
    stats = mpnn.init_batch_stats(cfg)
    feats, bp, _ = make_sequence(num_tracks=tracks, num_frames=frames, seed=seed)
    ws = build_window_schedule(feats, bp[:, :2].astype(np.int64),
                               bucket=n_shards * 32)
    cap = len(ws.is_det)
    assert cap % n_shards == 0
    plan = build_halo_plan(ws.is_det, ws.past, ws.fut, n_shards)
    return params, stats, ws, plan, cap


def _sharded_args(ws, plan, live, new, h):
    return (jnp.asarray(ws.is_det), jnp.asarray(plan.past_ext),
            jnp.asarray(plan.fut_ext), jnp.asarray(live), jnp.asarray(new),
            jnp.asarray(ws.feat), jnp.asarray(h),
            jnp.asarray(plan.send_idx), jnp.asarray(plan.send_valid))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_time_sharded_forward_matches(n_shards):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params, stats, ws, plan, cap = _setup(cfg, n_shards)

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
            params, stats, *_sharded_args(ws, plan, live, new, h_in))

        np.testing.assert_allclose(np.asarray(logits), np.asarray(out.logits),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_out), np.asarray(out.hidden),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(stats_sh["branches"]),
                        jax.tree_util.tree_leaves(stats_ref["branches"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_time_sharded_gat_matches(n_shards):
    """GAT heads under time sharding, including attention dropout driven by
    a replicated keep-mask that reproduces the unsharded draw exactly."""
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16, nattheads=2)
    params, stats, ws, plan, cap = _setup(cfg, n_shards, seed=5)

    mesh = make_mesh({"time": n_shards}, jax.devices()[:n_shards])
    fwd = make_time_sharded_forward(mesh, cfg, dropout=True)

    idx = np.arange(cap)
    nb = len(cfg.branches)
    h = 0.1 * np.asarray(
        jax.random.normal(jax.random.key(2), (cap, nb * cfg.nhidden)))
    rng = jax.random.key(7)
    # reproduce mpnn.forward's fold structure: branch, then head
    keep = np.zeros((nb, cfg.nattheads, 2, cap), bool)
    for bi in range(nb):
        rng_b = jax.random.fold_in(rng, bi)
        for hi in range(cfg.nattheads):
            k = jax.random.bernoulli(jax.random.fold_in(rng_b, hi), 0.5, (2 * cap,))
            keep[bi, hi] = np.asarray(k).reshape(2, cap)

    step = ws.n_steps - 1
    live = idx < ws.n_after[step]
    new = (idx >= ws.n_before[step]) & live
    g = GraphView(is_det=jnp.asarray(ws.is_det), past=jnp.asarray(ws.past),
                  fut=jnp.asarray(ws.fut), live=jnp.asarray(live),
                  new=jnp.asarray(new), feat=jnp.asarray(ws.feat))
    out, _ = mpnn.forward(params, stats, cfg, g, jnp.asarray(h), train=True, rng=rng)

    scores, logits, h_out, _ = fwd(
        params, stats, *_sharded_args(ws, plan, live, new, h), jnp.asarray(keep))

    np.testing.assert_allclose(np.asarray(logits), np.asarray(out.logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(out.hidden),
                               rtol=1e-4, atol=1e-5)


def test_halo_volume_is_boundary_sized():
    """The plan must ship far less than the window: comm ∝ boundary rows
    (the active lists crossing shard cuts), not ∝ cap."""
    feats, bp, _ = make_sequence(num_tracks=8, num_frames=16, seed=11)
    ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), bucket=256)
    cap = len(ws.is_det)
    for P in (2, 4, 8):
        if cap % P:
            continue
        plan = build_halo_plan(ws.is_det, ws.past, ws.fut, P)
        H = 64
        allgather_bytes = cap * H * 4 * 2  # old scheme: full gather + psum
        assert plan.comm_bytes_per_round(H) < allgather_bytes / 2, (
            P, plan.comm_rows, cap)
        # every halo row is a real cross-boundary endpoint
        assert plan.comm_rows <= 2 * int((~ws.is_det[: ws.n_rows]).sum())


def test_time_sharded_window_scan():
    """Full-window scan over the teacher-forced steps stays equal to the
    unsharded per-step recurrence."""
    n_shards = 4
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params, stats, ws, plan, cap = _setup(cfg, n_shards, seed=9, frames=8)
    mesh = make_mesh({"time": n_shards}, jax.devices()[:n_shards])
    t_cap = len(ws.n_before)
    fwd = make_time_sharded_window(mesh, cfg, n_steps=t_cap)

    logits_sh, h_sh, stats_sh = fwd(
        params, stats, jnp.asarray(ws.is_det), jnp.asarray(plan.past_ext),
        jnp.asarray(plan.fut_ext), jnp.asarray(ws.feat),
        jnp.asarray(ws.n_before), jnp.asarray(ws.n_after),
        jnp.asarray(plan.send_idx), jnp.asarray(plan.send_valid))

    # unsharded recurrence
    idx = np.arange(cap)
    h = jnp.zeros((cap, len(cfg.branches) * cfg.nhidden), jnp.float32)
    st = stats
    for s in range(t_cap):
        live = idx < ws.n_after[s]
        new = (idx >= ws.n_before[s]) & live
        g = GraphView(is_det=jnp.asarray(ws.is_det), past=jnp.asarray(ws.past),
                      fut=jnp.asarray(ws.fut), live=jnp.asarray(live),
                      new=jnp.asarray(new), feat=jnp.asarray(ws.feat))
        out, st = mpnn.forward(params, st, cfg, g, h, train=True)
        h = out.hidden
        np.testing.assert_allclose(np.asarray(logits_sh[s]),
                                   np.asarray(out.logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_sh), np.asarray(h),
                               rtol=1e-4, atol=1e-4)
