"""End-to-end: train on synthetic sequences, track held-out sequences,
assert real MOTA/IDF1 - the reference's val loop shape (train.py:177-313)
driven entirely by the framework."""

import jax
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.decode import Tracker, TrackerConfig
from trackmpnn_tpu.eval.mot import accumulate_sequence, summarize
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.step import make_train_step, schedule_to_device


def train_quick(cfg, seeds=range(10), frames=8, epochs=80, lr=3e-3):
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(lr)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tp_classifier=True)
    wins = []
    for s in seeds:
        feats, bp, _ = make_sequence(num_tracks=5, num_frames=frames, seed=s)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), cap=512, t_cap=frames + 2)
        if ws is not None:
            wins.append(schedule_to_device(ws))
    for _ in range(epochs):
        for sb in wins:
            params, stats, opt_state, _, _ = step(params, stats, opt_state, sb)
    return params, stats


@pytest.fixture(scope="module")
def trained():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=32)
    params, stats = train_quick(cfg)
    return cfg, params, stats


@pytest.mark.parametrize("hungarian", [False, True])
def test_synthetic_mota(trained, hungarian):
    cfg, params, stats = trained
    tracker = Tracker(params, stats, cfg,
                      TrackerConfig(cur_win_size=5, ret_win_size=5, hungarian=hungarian))
    accs = []
    for seed in range(100, 106):
        feats, bbox_pred, bbox_gt = make_sequence(
            num_tracks=5, num_frames=12, seed=seed, miss_rate=0.05, fp_rate=0.05
        )
        y_seq = bbox_pred[:, :2].astype(np.int64)
        y_out = tracker.run(feats, y_seq)
        y_gt = bbox_gt[:, :2].astype(np.int64)
        acc = accumulate_sequence(bbox_pred[:, 2:], bbox_gt[:, 2:], y_out, y_gt)
        assert acc is not None
        accs.append(acc)
    m = summarize(accs)
    # Averaged over 6 held-out sequences the aggregate metric is stable
    # (per-seq variance 0.50-0.98 washes out); thresholds sit ~0.10-0.14
    # below deterministic observed values (greedy 0.745/0.698, hungarian
    # 0.865/0.847) so a >=15-point regression cannot hide.
    if hungarian:
        assert m["mota"] > 0.75 and m["idf1"] > 0.71, m
    else:
        assert m["mota"] > 0.60 and m["idf1"] > 0.56, m


def test_tracker_empty_sequence(trained):
    cfg, params, stats = trained
    tracker = Tracker(params, stats, cfg, TrackerConfig())
    y_out = tracker.run(np.zeros((0, cfg.nfeatures), np.float32), np.zeros((0, 2), np.int64))
    assert y_out.shape == (0, 2)


def test_tracker_single_frame(trained):
    cfg, params, stats = trained
    tracker = Tracker(params, stats, cfg, TrackerConfig())
    X = np.zeros((3, cfg.nfeatures), np.float32)
    y = np.array([[0, 0], [0, 1], [0, 2]], np.int64)
    y_out = tracker.run(X, y)
    assert np.all(y_out[:, 1] == -1)
