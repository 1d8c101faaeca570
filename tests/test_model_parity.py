"""Activation parity: TPU-native TrackMPNN vs dense PyTorch oracle.

Covers the north-star `allclose` requirement (BASELINE.md): input MLP with
masked BatchNorm (train + eval), diff/concat messaging, GAT attention,
multi-step recurrence with newly-appended rows, and BN running-stat updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.models import mpnn

from torch_oracle import OracleModel


def randomize(params, key, scale=0.5):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new = [scale * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def two_frame_graph(cap, n0, n1, nfeats, rng):
    """Reference-order slots: [dets_t0 | edges (i*n1+j) | dets_t1]."""
    n = n0 + n0 * n1 + n1
    is_det = np.zeros(cap, bool)
    past = np.arange(cap, dtype=np.int32)
    fut = np.arange(cap, dtype=np.int32)
    is_det[:n0] = True
    is_det[n0 + n0 * n1 : n] = True
    for i in range(n0):
        for j in range(n1):
            e = n0 + i * n1 + j
            past[e] = i
            fut[e] = n0 + n0 * n1 + j
    live = np.zeros(cap, bool)
    live[:n] = True
    feat = np.zeros((cap, nfeats), np.float32)
    feat[:n] = np.where(is_det[:n, None], rng.normal(size=(n, nfeats)), 0).astype(np.float32)
    return n, is_det, past, fut, live, feat


def append_frame(cap, n, is_det, past, fut, live, feat, active, n2, rng):
    """Append a new frame: [edges (i*n2+j, active order) | dets_t2].

    Pure: returns NEW arrays.  The step-1 inputs must never be mutated in
    place — `jnp.asarray` may alias the numpy buffers and JAX dispatch is
    async, so mutation races with the step-1 forward's materialization
    (the original source of a hash-seed-dependent parity flake)."""
    is_det, past, fut, live, feat = (a.copy() for a in (is_det, past, fut, live, feat))
    ne = len(active) * n2
    for k, d in enumerate(active):
        for j in range(n2):
            e = n + k * n2 + j
            past[e] = d
            fut[e] = n + ne + j
            live[e] = True
    new = np.zeros(cap, bool)
    new[n : n + ne + n2] = True
    for j in range(n2):
        d = n + ne + j
        is_det[d] = True
        live[d] = True
        feat[d] = rng.normal(size=feat.shape[1]).astype(np.float32)
    return n + ne + n2, new, is_det, past, fut, live, feat


@pytest.mark.parametrize("msg_type", ["diff", "concat"])
@pytest.mark.parametrize("train", [True, False])
def test_single_step_parity(rng, msg_type, train):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16, nattheads=0, msg_type=msg_type)
    cap = 48
    n, is_det, past, fut, live, feat = two_frame_graph(cap, 3, 4, cfg.nfeatures, rng)
    params = randomize(mpnn.init_params(jax.random.key(0), cfg), jax.random.key(1))
    stats = mpnn.init_batch_stats(cfg)

    g = GraphView(
        is_det=jnp.asarray(is_det), past=jnp.asarray(past), fut=jnp.asarray(fut),
        live=jnp.asarray(live), new=jnp.asarray(live), feat=jnp.asarray(feat),
    )
    out, new_stats = mpnn.forward(params, stats, cfg, g, None, train=train)

    oracle = OracleModel(params, cfg)
    o_scores, o_logits, o_h = oracle.forward(feat, None, is_det, past, fut, live, live, train)

    np.testing.assert_allclose(np.asarray(out.logits)[:n], o_logits[:n], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.hidden)[:n], o_h[:n], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.scores)[:n], o_scores[:n], rtol=1e-4, atol=1e-5)
    if train:
        # BN running stats must match torch momentum-0.1 updates
        want_mean = oracle.branches[0]["bn"].running_mean.numpy()
        got_mean = np.asarray(new_stats["branches"][0]["bn"]["mean"])
        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-4, atol=1e-5)
        want_var = oracle.branches[0]["bn"].running_var.numpy()
        got_var = np.asarray(new_stats["branches"][0]["bn"]["var"])
        np.testing.assert_allclose(got_var, want_var, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("features", ["2d", "2d+temp"])
def test_two_step_recurrence_parity(rng, features):
    cfg = mpnn.ModelConfig(features=features, ncategories=3, nhidden=16, msg_type="diff")
    cap = 96
    n, is_det, past, fut, live, feat = two_frame_graph(cap, 3, 4, cfg.nfeatures, rng)
    params = randomize(mpnn.init_params(jax.random.key(0), cfg), jax.random.key(2))
    stats = mpnn.init_batch_stats(cfg)

    g1 = GraphView(
        is_det=jnp.asarray(is_det), past=jnp.asarray(past), fut=jnp.asarray(fut),
        live=jnp.asarray(live), new=jnp.asarray(live), feat=jnp.asarray(feat),
    )
    out1, stats1 = mpnn.forward(params, stats, cfg, g1, None, train=True)

    # frame 3: dets 0 (unassociated) and the whole last frame are active
    active = [0] + list(range(3 + 12, n))
    n2_count = 3
    new_n, new_mask, is_det2, past2, fut2, live2, feat2 = append_frame(
        cap, n, is_det, past, fut, live, feat, active, n2_count, rng
    )
    g2 = GraphView(
        is_det=jnp.asarray(is_det2), past=jnp.asarray(past2), fut=jnp.asarray(fut2),
        live=jnp.asarray(live2), new=jnp.asarray(new_mask), feat=jnp.asarray(feat2),
    )
    out2, _ = mpnn.forward(params, stats1, cfg, g2, out1.hidden, train=True)

    oracle = OracleModel(params, cfg)
    _, o_logits1, o_h1 = oracle.forward(feat, None, is_det, past, fut, live, live, True)
    _, o_logits2, o_h2 = oracle.forward(feat2, o_h1, is_det2, past2, fut2, live2, new_mask, True)

    np.testing.assert_allclose(np.asarray(out2.logits)[:new_n], o_logits2[:new_n], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2.hidden)[:new_n], o_h2[:new_n], rtol=1e-4, atol=1e-5)


def test_gat_parity(rng):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16, nattheads=2, msg_type="diff")
    cap = 48
    n, is_det, past, fut, live, feat = two_frame_graph(cap, 3, 4, cfg.nfeatures, rng)
    params = randomize(mpnn.init_params(jax.random.key(0), cfg), jax.random.key(3))
    stats = mpnn.init_batch_stats(cfg)
    g = GraphView(
        is_det=jnp.asarray(is_det), past=jnp.asarray(past), fut=jnp.asarray(fut),
        live=jnp.asarray(live), new=jnp.asarray(live), feat=jnp.asarray(feat),
    )
    # eval mode: attention dropout off, so RNG-free parity holds
    out, _ = mpnn.forward(params, stats, cfg, g, None, train=False)
    oracle = OracleModel(params, cfg)
    _, o_logits, o_h = oracle.forward(feat, None, is_det, past, fut, live, live, False)
    np.testing.assert_allclose(np.asarray(out.logits)[:n], o_logits[:n], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.hidden)[:n], o_h[:n], rtol=1e-4, atol=1e-4)
