"""Packed block-diagonal batching == vmapped batching (loss + grads)."""

import jax
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.parallel.data_parallel import batch_schedules, batched_window_forward
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.packed import make_packed_train_step, pack_schedules, packed_window_forward

CAP, TCAP = 256, 10


def build(n):
    out, s = [], 0
    while len(out) < n:
        feats, bp, _ = make_sequence(num_tracks=4, num_frames=5 + (s % 3), seed=s)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), cap=CAP, t_cap=TCAP)
        if ws is not None:
            out.append(ws)
        s += 1
    return out


def _perturbed_model():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        lambda l: l + 0.2 * jax.random.normal(jax.random.key(1), l.shape), params)
    stats = mpnn.init_batch_stats(cfg)
    return cfg, params, stats


def test_packed_single_window_exact():
    """B=1: packed == vmapped exactly (no BN pooling difference)."""
    cfg, params, stats = _perturbed_model()
    schedules = build(1)
    sbatch = batch_schedules(schedules, CAP, TCAP)
    pb = pack_schedules(schedules, CAP, TCAP)
    lv, gv = jax.value_and_grad(
        lambda p: batched_window_forward(p, stats, cfg, sbatch, True)[0])(params)
    lp, gp = jax.value_and_grad(
        lambda p: packed_window_forward(p, stats, cfg, pb, True)[0])(params)
    np.testing.assert_allclose(float(lp), float(lv), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_packed_matches_vmapped_eval_mode():
    """B=4 with eval-mode BN (running stats): packing is semantics-free, so
    loss and grads must match the vmapped path.  (Train-mode BN pools batch
    statistics across the packed windows - the documented sync-BN choice -
    and is covered by the B=1 exact test above.)"""
    cfg, params, stats = _perturbed_model()
    schedules = build(4)
    sbatch = batch_schedules(schedules, CAP, TCAP)
    pb = pack_schedules(schedules, CAP, TCAP)
    lv, gv = jax.value_and_grad(
        lambda p: batched_window_forward(p, stats, cfg, sbatch, True, train=False)[0])(params)
    lp, gp = jax.value_and_grad(
        lambda p: packed_window_forward(p, stats, cfg, pb, True, train=False)[0])(params)
    np.testing.assert_allclose(float(lp), float(lv), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_packed_train_step_converges():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(3e-3)
    opt = tx.init(params)
    step = make_packed_train_step(cfg, tx, True)
    pb = pack_schedules(build(4), CAP, TCAP)
    first = last = None
    for _ in range(80):
        params, stats, opt, loss, aux = step(params, stats, opt, pb)
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < 0.5 * first, (first, last)


def test_gat_training_paths_need_and_accept_rng():
    """Training with GAT heads uses attention dropout: the step must demand
    an rng key (clear error) and run when given one - on the unbatched,
    packed, and vmapped paths (regression: round-1 crashed with a cryptic
    'unexpected PRNG key type NoneType')."""
    from trackmpnn_tpu.train.step import make_train_step, schedule_to_device

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16, nattheads=2)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-3)
    schedules = build(2)
    key = jax.random.key(3)

    with pytest.raises(ValueError, match="rng"):
        packed_window_forward(params, stats, cfg,
                              pack_schedules(schedules, CAP, TCAP), True)

    step_p = make_packed_train_step(cfg, tx, True)
    p2, s2, o2, loss, _ = step_p(params, stats, tx.init(params),
                                 pack_schedules(schedules, CAP, TCAP), rng=key)
    assert np.isfinite(float(loss))

    step_1 = make_train_step(cfg, tx, True)
    sb = schedule_to_device(schedules[0])
    p3, s3, o3, loss1, _ = step_1(params, stats, tx.init(params), sb, rng=key)
    assert np.isfinite(float(loss1))

    lossb, _ = batched_window_forward(params, stats, cfg,
                                      batch_schedules(schedules, CAP, TCAP),
                                      True, rng=key)
    assert np.isfinite(float(lossb))
