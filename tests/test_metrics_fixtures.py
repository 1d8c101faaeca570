"""Hand-computed CLEAR-MOT / IDF1 fixtures, asserted EXACTLY against both
eval/mot.py and the event-log oracle (tests/motmetrics_oracle.py).

The fuzz test (test_metrics_oracle.py) pins the two first-party
implementations to each other; these fixtures close the remaining hole —
a shared misreading of py-motmetrics semantics — by pinning both to
worked examples whose every event and metric is derived by hand below
(fixture 4 is py-motmetrics' own README walkthrough; the others are
Bernardin & Stiefelhagen / Ristani-style minimal streams).  Consumer in
the reference: /root/reference/utils/metrics.py:47-61.
"""

import numpy as np
import pytest

from motmetrics_oracle import OracleAccumulator, oracle_summarize
from trackmpnn_tpu.eval.mot import MOTAccumulator, summarize

NAN = np.nan


def run_both(frames_list):
    """frames_list: list of sequences; each sequence is a list of
    (gt_ids, hyp_ids, dists) per frame.  Returns (ours, oracle) summaries."""
    ours, oracle = [], []
    for seq in frames_list:
        a, b = MOTAccumulator(), OracleAccumulator()
        for gt, hyp, d in seq:
            d = np.asarray(d, dtype=float).reshape(len(gt), len(hyp))
            a.update(gt, hyp, d)
            b.update(gt, hyp, d)
        ours.append(a)
        oracle.append(b)
    return summarize(ours), oracle_summarize(oracle)


def check(summ, **expected):
    for k, v in expected.items():
        assert summ[k] == pytest.approx(v, abs=1e-12), (k, summ[k], v)


# --- fixture 1: perfect tracking -------------------------------------------
# 1 object, 3 frames, exact hits.  Every metric at its ideal value.
PERFECT = [[([1], [5], [[0.0]]) for _ in range(3)]]
PERFECT_EXPECT = dict(mota=1.0, motp=0.0, idf1=1.0, idp=1.0, idr=1.0,
                      recall=1.0, precision=1.0, num_false_positives=0,
                      num_misses=0, num_switches=0, num_fragmentations=0,
                      mostly_tracked=1, partially_tracked=0, mostly_lost=0,
                      num_unique_objects=1)

# --- fixture 2: one identity switch ----------------------------------------
# 1 object over 4 frames; hypothesis id changes 1 -> 2 at frame 2.
# Events: MATCH, MATCH, SWITCH, MATCH.  num_gt=4, IDSW=1
#   MOTA = 1 - (0+0+1)/4 = 0.75
#   ID: best trajectory match covers 2 of 4 frames either way
#   => IDTP=2, IDFP=2, IDFN=2, IDF1 = 2*2/(4+2+2) = 0.5
SWITCH = [[([1], [1], [[0.0]]), ([1], [1], [[0.0]]),
           ([1], [2], [[0.0]]), ([1], [2], [[0.0]])]]
SWITCH_EXPECT = dict(mota=0.75, motp=0.0, idf1=0.5, idp=0.5, idr=0.5,
                     num_switches=1, num_misses=0, num_false_positives=0,
                     num_fragmentations=0, mostly_tracked=1)

# --- fixture 3: miss + false positive (gated out) ---------------------------
# 1 object, 3 frames; the hypothesis drifts out of the IoU gate at frame 2,
# producing simultaneously one MISS and one FP.
#   MOTA = 1 - (1+1+0)/3 = 1/3;  MOTP = (0.2+0.3)/2 = 0.25
#   ID: overlap(7,4)=2 of gt 3 / hyp 3 frames => IDF1 = 4/(4+1+1) = 2/3
MISS_FP = [[([7], [4], [[0.2]]), ([7], [4], [[0.3]]), ([7], [4], [[NAN]])]]
MISS_FP_EXPECT = dict(mota=1 / 3, motp=0.25, idf1=2 / 3, idp=2 / 3, idr=2 / 3,
                      num_misses=1, num_false_positives=1, num_switches=0,
                      num_fragmentations=0)

# --- fixture 4: the py-motmetrics README walkthrough ------------------------
# 2 objects, 3 frames (the package's own documented example; its README
# derives the full event table by hand):
#   f0: MATCH(1,1,0.1) MATCH(2,2,0.2) FP(3)
#   f1: MATCH(1,1,0.2) MISS(2)
#   f2: MATCH(1,1,0.6)  [last-known re-established despite 0.2 to h3]
#       SWITCH(2,3,0.6)
#   num_gt=6: MOTA = 1 - (1+1+1)/6 = 0.5;  MOTP = 1.7/5 = 0.34
#   ID overlaps: (1,1)=3 (1,3)=2 (2,1)=3 (2,2)=1 (2,3)=2; best full matching
#   = 5 => IDF1 = 10/12 = 5/6.  gt1 tracked 3/3 (MT), gt2 2/3 (PT), FRAG=1.
README = [[([1, 2], [1, 2, 3], [[0.1, NAN, 0.3], [0.5, 0.2, 0.3]]),
           ([1, 2], [1], [[0.2], [0.4]]),
           ([1, 2], [1, 3], [[0.6, 0.2], [0.1, 0.6]])]]
README_EXPECT = dict(mota=0.5, motp=0.34, idf1=5 / 6, idp=5 / 6, idr=5 / 6,
                     num_misses=1, num_false_positives=1, num_switches=1,
                     num_fragmentations=1, mostly_tracked=1,
                     partially_tracked=1, mostly_lost=0,
                     num_unique_objects=2)

# --- fixture 5: fragmentation without switch --------------------------------
# 1 object, 5 frames; hypothesis disappears for frame 2 only, same id after.
#   MOTA = 1 - 1/5 = 0.8, FRAG=1, IDSW=0, ratio 4/5 => MT
#   ID: overlap=4, gt 5 / hyp 4 frames => IDTP=4, IDF1 = 8/9, IDP=1, IDR=0.8
FRAG = [[([3], [9], [[0.0]]), ([3], [9], [[0.0]]),
         ([3], [], np.zeros((1, 0))),
         ([3], [9], [[0.0]]), ([3], [9], [[0.0]])]]
FRAG_EXPECT = dict(mota=0.8, idf1=8 / 9, idp=1.0, idr=0.8,
                   num_fragmentations=1, num_switches=0, num_misses=1,
                   num_false_positives=0, mostly_tracked=1)

# --- fixture 6: multi-sequence pooling --------------------------------------
# Sequences of fixtures 2 and 3 pooled, like the reference's OVERALL row:
#   num_gt=7, FN=1, FP=1, IDSW=1 => MOTA = 4/7
#   IDTP = 2+2 = 4 over 7 gt / 7 hyp frames => IDF1 = 8/14 = 4/7
POOLED = [SWITCH[0], MISS_FP[0]]
POOLED_EXPECT = dict(mota=4 / 7, idf1=4 / 7, num_switches=1, num_misses=1,
                     num_false_positives=1, num_unique_objects=2)

CASES = [
    ("perfect", PERFECT, PERFECT_EXPECT),
    ("switch", SWITCH, SWITCH_EXPECT),
    ("miss_fp", MISS_FP, MISS_FP_EXPECT),
    ("readme", README, README_EXPECT),
    ("frag", FRAG, FRAG_EXPECT),
    ("pooled", POOLED, POOLED_EXPECT),
]


@pytest.mark.parametrize("name,frames,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_fixture(name, frames, expected):
    ours, oracle = run_both(frames)
    check(ours, **expected)
    check(oracle, **expected)
