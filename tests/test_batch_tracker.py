"""BatchedTracker must reproduce the single-sequence Tracker exactly."""

import jax
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.decode import Tracker, TrackerConfig
from trackmpnn_tpu.decode.batch_tracker import BatchedTracker
from trackmpnn_tpu.models import mpnn


@pytest.fixture(scope="module")
def model():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    return cfg, params, stats


@pytest.mark.parametrize("hungarian", [False, True])
def test_batched_matches_single(model, hungarian):
    cfg, params, stats = model
    tcfg = TrackerConfig(cur_win_size=4, ret_win_size=2, hungarian=hungarian,
                         bucket=128)
    seqs = []
    for seed, frames in [(31, 8), (32, 6), (33, 10)]:
        feats, bp, _ = make_sequence(num_tracks=4, num_frames=frames, seed=seed)
        seqs.append((feats, bp[:, :2].astype(np.int64)))
    # a degenerate empty sequence must pass through unharmed
    seqs.append((np.zeros((0, cfg.nfeatures), np.float32), np.zeros((0, 2), np.int64)))

    single = Tracker(params, stats, cfg, tcfg)
    want = [single.run(X, y) for X, y in seqs]

    batched = BatchedTracker(params, stats, cfg, tcfg)
    got = batched.run(seqs)

    assert len(got) == len(want)
    for k, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(a, b, err_msg=f"sequence {k}")


def test_pipelined_matches_lockstep(model):
    """Cohort double-buffering (pipeline=True) must produce byte-identical
    tracks to the lockstep loop, and fire on_step the same number of times
    per sequence with the same score payloads (only cross-sequence
    interleaving may differ)."""
    cfg, params, stats = model
    tcfg = TrackerConfig(cur_win_size=4, ret_win_size=1, hungarian=True,
                         bucket=128, prune_threshold=0.2)
    seqs = []
    for seed, frames in [(51, 9), (52, 6), (53, 11), (54, 7), (55, 5)]:
        feats, bp, _ = make_sequence(num_tracks=4, num_frames=frames,
                                     seed=seed, miss_rate=0.1, fp_rate=0.15)
        seqs.append((feats, bp[:, :2].astype(np.int64)))

    tracker = BatchedTracker(params, stats, cfg, tcfg)
    calls_lock, calls_pipe = {}, {}

    def rec(store):
        return lambda i, g, sc: store.setdefault(i, []).append(sc.copy())

    want = tracker.run(seqs, on_step=rec(calls_lock), pipeline=False)
    got = tracker.run(seqs, on_step=rec(calls_pipe), pipeline=True)

    for k, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(a, b, err_msg=f"sequence {k}")
    assert set(calls_lock) == set(calls_pipe)
    for i in calls_lock:
        assert len(calls_lock[i]) == len(calls_pipe[i])
        for a, b in zip(calls_lock[i], calls_pipe[i]):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_batched_matches_single_with_pruning(model):
    """prune_threshold must apply identically in both trackers (it was
    silently ignored by BatchedTracker)."""
    cfg, params, stats = model
    tcfg = TrackerConfig(cur_win_size=4, ret_win_size=1, hungarian=False,
                         bucket=128, prune_threshold=0.3)
    seqs = []
    for seed, frames in [(41, 8), (42, 7)]:
        feats, bp, _ = make_sequence(num_tracks=4, num_frames=frames,
                                     seed=seed, miss_rate=0.15, fp_rate=0.2)
        seqs.append((feats, bp[:, :2].astype(np.int64)))
    single = Tracker(params, stats, cfg, tcfg)
    want = [single.run(X, y) for X, y in seqs]
    got = BatchedTracker(params, stats, cfg, tcfg).run(seqs)
    for k, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(a, b, err_msg=f"sequence {k}")
