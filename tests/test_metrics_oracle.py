"""eval/mot.py == py-motmetrics semantics (independent oracle cross-check).

The canonical package is not installed in this environment, so
tests/motmetrics_oracle.py transcribes its algorithm (event-log based,
structurally different from the production online counters) and these
tests fuzz both over randomized event streams: every count metric must
agree exactly, every ratio to float precision.  This pins MOTA / IDF1 /
IDS / FRAG / MT / ML — the numbers every headline result flows through
(reference consumer: /root/reference/utils/metrics.py:47-61)."""

import numpy as np
import pytest

from motmetrics_oracle import OracleAccumulator, oracle_summarize
from trackmpnn_tpu.eval.mot import MOTAccumulator, summarize

COUNT_KEYS = ["num_false_positives", "num_misses", "num_switches",
              "num_fragmentations", "mostly_tracked", "partially_tracked",
              "mostly_lost", "num_unique_objects"]
FLOAT_KEYS = ["mota", "motp", "idf1", "idp", "idr", "recall", "precision"]


def random_stream(rng, frames=30, n_gt=6, n_hyp=7, p_gt=0.7, p_hyp=0.7,
                  p_valid=0.5):
    """Per frame: subsets of gt/hyp ids + a gated random distance matrix."""
    out = []
    for _ in range(frames):
        oids = [o for o in range(n_gt) if rng.random() < p_gt]
        hids = [100 + h for h in range(n_hyp) if rng.random() < p_hyp]
        D = rng.random((len(oids), len(hids)))
        D[rng.random(D.shape) > p_valid] = np.nan
        out.append((oids, hids, D))
    return out


def run_both(streams):
    ours, oracle = [], []
    for st in streams:
        a, b = MOTAccumulator(), OracleAccumulator()
        for oids, hids, D in st:
            a.update(oids, hids, D)
            b.update(oids, hids, D)
        ours.append(a)
        oracle.append(b)
    return summarize(ours), oracle_summarize(oracle)


def assert_agree(got, want):
    for k in COUNT_KEYS:
        assert got[k] == want[k], (k, got[k], want[k])
    for k in FLOAT_KEYS:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, atol=1e-12,
                                   err_msg=k)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_single_sequence(seed):
    rng = np.random.default_rng(seed)
    assert_agree(*run_both([random_stream(rng)]))


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_multi_sequence_pooled(seed):
    rng = np.random.default_rng(1000 + seed)
    streams = [random_stream(rng, frames=15, n_gt=4, n_hyp=4)
               for _ in range(3)]
    assert_agree(*run_both(streams))


def test_reid_after_gap_is_not_a_switch():
    """py-motmetrics re-establishes the LAST KNOWN correspondence across
    gaps (its `self.m` is never forgotten): gt 0 matched to hyp 100, absent
    a frame, then candidates 100 and 101 both in gate with 101 cheaper -
    the carry-over to 100 wins BEFORE Hungarian, so no switch."""
    D0 = np.array([[0.2, np.nan]])
    D2 = np.array([[0.4, 0.1]])
    st = [([0], [100, 101], D0), ([], [], np.zeros((0, 0))),
          ([0], [100, 101], D2)]
    got, want = run_both([st])
    assert want["num_switches"] == 0
    assert_agree(got, want)


def test_shared_last_hyp_claimed_once():
    """Two gts whose last known hyp is the same (after a switch sequence)
    must not both carry over to it - first in gt order claims it."""
    st = [
        ([0], [100], np.array([[0.1]])),          # 0 -> 100
        ([1], [100], np.array([[0.1]])),          # 1 -> 100 (0 absent)
        ([0, 1], [100, 101], np.array([[0.1, 0.2], [0.1, 0.3]])),
    ]
    got, want = run_both([st])
    assert_agree(got, want)


def test_empty_and_degenerate_frames():
    st = [([], [], np.zeros((0, 0))),
          ([0, 1], [], np.zeros((2, 0))),
          ([], [100], np.zeros((0, 1))),
          ([0], [100], np.array([[np.nan]]))]
    got, want = run_both([st])
    assert got["num_misses"] == 3 and got["num_false_positives"] == 2
    assert_agree(got, want)


def test_fragmentation_counting():
    """Gap inside the tracked span = 1 FRAG; trailing misses after the last
    match are not fragmentations (motmetrics span rule)."""
    m = np.array([[0.1]])
    miss = np.array([[np.nan]])
    st = [([0], [100], m), ([0], [100], miss), ([0], [100], m),
          ([0], [100], miss), ([0], [100], miss)]
    got, want = run_both([st])
    assert want["num_fragmentations"] == 1
    assert_agree(got, want)
