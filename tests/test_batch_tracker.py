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
