"""Graph-exhaustion re-initialization in the rolling tracker
(ref infer.py:64-69), plus interleaved update/decode fuzz equivalence for
the native planner."""

import copy

import jax
import numpy as np
import pytest

from trackmpnn_tpu import native
from trackmpnn_tpu.decode import Tracker, TrackerConfig
from trackmpnn_tpu.graph import engine
from trackmpnn_tpu.models import mpnn


def gap_sequence():
    """Two bursts of detections separated by a long empty gap: with
    ret_win 0 and a small window, the graph empties mid-sequence and the
    tracker must re-initialize at the second burst."""
    rows = []
    for fr in (0, 1, 2):
        rows += [[fr, 0], [fr, 1]]
    for fr in (20, 21, 22):
        rows += [[fr, 2], [fr, 3]]
    return np.array(rows, np.int64)


def test_tracker_reinitializes_after_gap():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    y = gap_sequence()
    X = np.linspace(-1, 1, y.shape[0] * cfg.nfeatures).reshape(
        y.shape[0], cfg.nfeatures).astype(np.float32)
    tracker = Tracker(params, stats, cfg,
                      TrackerConfig(cur_win_size=3, ret_win_size=0,
                                    hungarian=True, bucket=64))
    seen = []
    tracker.run(X, y, on_step=lambda g, s: seen.append(sorted(set(
        int(t) for t in g.ts[g.ts != -1]))))
    # some step after the gap must contain only second-burst frames:
    # proof that the graph emptied and re-initialized
    assert any(frames and min(frames) >= 20 for frames in seen), seen


@pytest.mark.skipif(not native.available(), reason="native planner not built")
@pytest.mark.parametrize("seed", range(6))
def test_interleaved_update_decode_fuzz(seed):
    """Random interleavings of update + decode must stay byte-identical
    between the native planner and the numpy engine."""
    rng = np.random.default_rng(400 + seed)
    rows = []
    for fr in range(8):
        for k in range(4):
            if rng.random() < 0.75:
                rows.append([fr, k if rng.random() > 0.2 else -1])
    y = np.array(rows, np.int64)

    outs = []
    for force_py in (False, True):
        engine._WANT_NATIVE = not force_py
        try:
            g = engine.initialize(y, 0, "test")
            if g is None:
                return
            y_out = y.copy()
            y_out[:, 1] = -1
            r = np.random.default_rng(99)  # identical scores both runs
            for t in range(g.t_next, g.t_end):
                s = r.uniform(0, 1, (g.n, 2)).astype(np.float32)
                s[:, 0] = 1 - s[:, 1]
                engine.update(g, y, t, s, mode="test",
                              use_hungarian=bool(t % 2))
                s = r.uniform(0, 1, (g.n, 2)).astype(np.float32)
                s[:, 0] = 1 - s[:, 1]
                engine.decode_tracks(g, s, y_out, t - 2, ret_win_size=1,
                                     use_hungarian=bool(t % 2))
                if g.n == 0:
                    break
            outs.append((y_out.copy(), g.ts.copy(), g.det_id.copy()))
        finally:
            engine._WANT_NATIVE = True

    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
