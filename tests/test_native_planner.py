"""Fuzz equivalence: C++ graph planner vs the numpy reference engine.

Random rolling-graph states are evolved with both implementations; every
association mode and the decode plan must agree exactly.
"""

import copy

import numpy as np
import pytest

from trackmpnn_tpu import native
from trackmpnn_tpu.graph import engine

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native planner not built")


def random_world(rng, frames=6, tracks=5, fp_rate=0.2):
    rows = []
    for fr in range(frames):
        for k in range(tracks):
            if rng.random() < 0.8:
                rows.append([fr, k])
        for _ in range(rng.poisson(fp_rate * tracks)):
            rows.append([fr, -1])
    return np.array(rows, np.int64) if rows else np.zeros((0, 2), np.int64)


def evolve(y, rng, use_hungarian, steps=3):
    """Run init + a few test-mode updates with random scores; return the
    graph + final random scores."""
    g = engine.initialize(y, 0, "test")
    if g is None:
        return None, None
    for t in range(g.t_next, min(g.t_next + steps, g.t_end)):
        s = rng.uniform(0, 1, (g.n, 2)).astype(np.float32)
        s[:, 0] = 1 - s[:, 1]
        engine.update(g, y, t, s, mode="test", use_hungarian=use_hungarian)
    s = rng.uniform(0, 1, (g.n, 2)).astype(np.float32)
    s[:, 0] = 1 - s[:, 1]
    return g, s


def clone(g):
    return copy.deepcopy(g)


@pytest.mark.parametrize("seed", range(8))
def test_associate_greedy_equivalence(seed):
    rng = np.random.default_rng(seed)
    g, s = evolve(random_world(rng), rng, use_hungarian=False)
    if g is None:
        return
    g2 = clone(g)
    engine.associate_greedy(g, s)
    native.associate_greedy(g2, s)
    np.testing.assert_array_equal(g.ass_id, g2.ass_id)


@pytest.mark.parametrize("seed", range(8))
def test_associate_hungarian_equivalence(seed):
    rng = np.random.default_rng(100 + seed)
    g, s = evolve(random_world(rng), rng, use_hungarian=True)
    if g is None:
        return
    g2 = clone(g)
    engine.associate_hungarian(g, s)
    native.associate_hungarian(g2, s)
    # LSA may have multiple optima on ties; verify identical assignment COST
    # per frame and identical assigned/unassigned sets where costs are unique
    same = np.array_equal(g.ass_id, g2.ass_id)
    if not same:
        # accept equal-total-cost alternate optima: both must associate the
        # same set of past rows per frame with equal summed cost
        def frame_cost(gr):
            total, cnt = 0.0, 0
            for i in np.where(gr.ass_id != -1)[0]:
                if gr.ts[i] == -1:
                    continue
                tgt = gr.ass_id[i]
                e = np.where((gr.ts == -1) & (gr.past == i)
                             & (gr.det_id[np.clip(gr.fut, 0, gr.n - 1)] == tgt))[0]
                if e.size:
                    total += float(s[e[0], 0])
                    cnt += 1
            return round(total, 4), cnt

        assert frame_cost(g) == frame_cost(g2)


@pytest.mark.parametrize("seed", range(8))
def test_associate_teacher_equivalence(seed):
    rng = np.random.default_rng(200 + seed)
    y = random_world(rng)
    g = engine.initialize(y, 0, "train")
    if g is None:
        return
    for t in range(g.t_next, min(g.t_next + 2, g.t_end)):
        engine.update(g, y, t, None, mode="train")
    g2 = clone(g)
    engine.associate_teacher_forced(g)
    native.associate_teacher_forced(g2)
    np.testing.assert_array_equal(g.ass_id, g2.ass_id)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("ret_win", [0, 3])
def test_decode_plan_equivalence(seed, ret_win):
    rng = np.random.default_rng(300 + seed)
    y = random_world(rng)
    g, s = evolve(y, rng, use_hungarian=False)
    if g is None:
        return
    engine.associate_greedy(g, s)
    g2 = clone(g)
    y_out = y.copy()
    y_out[:, 1] = -1
    y_out2 = y_out.copy()
    t_upto = int(g.t_next) - 2
    keep1 = engine._decode_plan_py(g, s, y_out, t_upto, ret_win)
    keep2 = native.decode_plan(g2, s, y_out2, t_upto, ret_win)
    np.testing.assert_array_equal(keep1, keep2)
    np.testing.assert_array_equal(y_out, y_out2)


def test_tracker_native_vs_python_identical():
    """Whole-sequence tracking must produce identical tracks with the
    native planner on and off."""
    import jax

    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.decode import Tracker, TrackerConfig
    from trackmpnn_tpu.models import mpnn

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    feats, bp, _ = make_sequence(num_tracks=4, num_frames=8, seed=11)
    y = bp[:, :2].astype(np.int64)

    outs = []
    for force_py in (False, True):
        engine._WANT_NATIVE = not force_py
        try:
            tracker = Tracker(params, stats, cfg,
                              TrackerConfig(hungarian=True, bucket=128))
            outs.append(tracker.run(feats, y))
        finally:
            engine._WANT_NATIVE = True
    np.testing.assert_array_equal(outs[0], outs[1])
