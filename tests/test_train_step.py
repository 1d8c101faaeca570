"""End-to-end training-step tests on synthetic sequences."""

import jax
import numpy as np

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train import checkpoint, optim
from trackmpnn_tpu.train.step import make_train_step, schedule_to_device


def make_windows(num=4, frames=8, cap=512, t_cap=10):
    wins = []
    for s in range(num):
        feats, bbox_pred, _ = make_sequence(num_tracks=5, num_frames=frames, seed=s)
        y = bbox_pred[:, :2].astype(np.int64)
        ws = build_window_schedule(feats, y, cap=cap, t_cap=t_cap)
        if ws is not None:
            wins.append(schedule_to_device(ws))
    return wins


def test_loss_decreases():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=32)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(3e-3)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tp_classifier=True)

    wins = make_windows()
    assert len(wins) >= 2
    first, last = None, None
    for epoch in range(25):
        tot = 0.0
        for sb in wins:
            params, stats, opt_state, loss, aux = step(params, stats, opt_state, sb)
            tot += float(loss)
        if first is None:
            first = tot
        last = tot
    assert last < 0.25 * first, (first, last)


def test_train_step_same_shapes_no_recompile():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tp_classifier=False)
    wins = make_windows(num=3)
    for sb in wins:
        params, stats, opt_state, loss, _ = step(params, stats, opt_state, sb)
    # all windows padded to same (cap, t_cap): exactly one compilation
    assert step._cache_size() == 1


def test_step_lr_schedule():
    lr = optim.step_lr(1e-4, 15, 0.2)
    assert np.isclose(lr(1), 1e-4) and np.isclose(lr(15), 1e-4)
    assert np.isclose(lr(16), 2e-5) and np.isclose(lr(31), 4e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    state = {"params": params, "batch_stats": stats, "epoch": 7, "best_mota": -1.5}
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, state)
    restored = checkpoint.load(p, state)
    assert restored["epoch"] == 7 and restored["best_mota"] == -1.5
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
