"""MOT metric sanity: known event patterns -> known MOTA/IDF1."""

import numpy as np

from trackmpnn_tpu.eval.mot import MOTAccumulator, iou_distance_matrix, summarize
from trackmpnn_tpu.eval.detection import compute_map


def box_dist(gt, hyp):
    return iou_distance_matrix(np.array(gt, float), np.array(hyp, float), 0.5)


def test_perfect_tracking():
    acc = MOTAccumulator()
    b = [[0, 0, 10, 10], [50, 50, 10, 10]]
    for _ in range(5):
        acc.update([1, 2], [7, 8], box_dist(b, b))
    m = summarize([acc])
    assert m["mota"] == 1.0
    assert m["idf1"] == 1.0
    assert m["num_switches"] == 0
    assert m["mostly_tracked"] == 2


def test_id_switch_counted():
    acc = MOTAccumulator()
    b = [[0, 0, 10, 10], [50, 50, 10, 10]]
    for _ in range(3):
        acc.update([1, 2], [7, 8], box_dist(b, b))
    # swap hypothesis ids: two switches
    for _ in range(3):
        acc.update([1, 2], [8, 7], box_dist(b, [b[1], b[0]])[:, ::-1] if False else box_dist(b, b))
    m = summarize([acc])
    assert m["num_switches"] == 2
    # MOTA = 1 - 2/12
    np.testing.assert_allclose(m["mota"], 1 - 2 / 12)
    # IDF1: best global match keeps 1<->7: 3 of 6 frames per track
    np.testing.assert_allclose(m["idf1"], 0.5)


def test_fp_and_miss():
    acc = MOTAccumulator()
    gt = [[0, 0, 10, 10]]
    hyp = [[0, 0, 10, 10], [100, 100, 10, 10]]
    for _ in range(4):
        acc.update([1], [7, 9], box_dist(gt, hyp))
    acc.update([1], [], np.zeros((1, 0)))
    m = summarize([acc])
    assert m["num_false_positives"] == 4
    assert m["num_misses"] == 1
    np.testing.assert_allclose(m["mota"], 1 - 5 / 5)


def test_continuity_preference():
    """A closer new hypothesis must not steal a continuing match."""
    acc = MOTAccumulator()
    gt = [[0, 0, 10, 10]]
    acc.update([1], [7], box_dist(gt, [[1, 1, 10, 10]]))
    # frame 2: hyp 9 overlaps slightly better, but 7 continues within gate
    D = box_dist(gt, [[1, 1, 10, 10], [0, 0, 10, 10]])
    acc.update([1], [7, 9], D)
    assert acc.last_match[1] == 7
    assert acc.num_switches == 0


def test_map_perfect_and_missing():
    y = np.array([[0, 0], [0, 1], [1, 0]], np.int64)
    bbox = np.zeros((3, 14), np.float32)
    bbox[:, 0] = 1  # class
    bbox[:, 2:6] = [[0, 0, 10, 10], [20, 20, 40, 40], [2, 2, 12, 12]]
    bbox[:, 13] = 0.9
    gt_dict = {"s": (y, bbox)}
    pred_dict = {"s": (y, bbox)}
    assert compute_map(pred_dict, gt_dict) == 1.0
    # drop one detection: recall caps at 2/3
    pred2 = {"s": (y[:2], bbox[:2])}
    assert abs(compute_map(pred2, gt_dict) - 2 / 3) < 1e-6


def test_map_ignores_detections_on_gt_empty_frames():
    """The reference evaluator iterates frames from the GT dict only
    (metrics.py:136): detections on a frame with zero GT rows contribute
    neither FPs nor PR entries."""
    y_gt = np.array([[0, 0]], np.int64)
    gt = np.zeros((1, 14), np.float32)
    gt[:, 0] = 1
    gt[:, 2:6] = [[0, 0, 10, 10]]
    gt[:, 13] = 1.0
    # prediction matches frame 0's GT AND adds a det on GT-empty frame 5
    y_pred = np.array([[0, 0], [5, 1]], np.int64)
    pred = np.zeros((2, 14), np.float32)
    pred[:, 0] = 1
    pred[:, 2:6] = [[0, 0, 10, 10], [50, 50, 60, 60]]
    pred[:, 13] = [0.9, 0.95]
    assert compute_map({"s": (y_pred, pred)}, {"s": (y_gt, gt)}) == 1.0


def test_map_tie_order_matches_reference_lexicographic_walk():
    """The reference visits frames as np.unique of "seq_frame" STRINGS
    (metrics.py:104), so frame 10 is visited BEFORE frame 2; with tied
    detection scores that order decides the tp/fp cumsum and the AP.
    Here frame 10 holds a score-0.9 FP and frame 2 a score-0.9 TP:
    lexicographic walk -> [fp, tp] -> AP 0.25; a numeric walk would give
    [tp, fp] -> AP 0.5.  Pinned by the BDD parity tree (94.3240 both
    sides, tools/debug_bdd_val_universe.py)."""
    y_gt = np.array([[2, 0], [10, 1]], np.int64)
    gt = np.zeros((2, 14), np.float32)
    gt[:, 0] = 1
    gt[:, 2:6] = [[0, 0, 10, 10], [100, 100, 110, 110]]
    gt[:, 13] = 1.0
    y_pred = np.array([[2, 0], [10, 1]], np.int64)
    pred = np.zeros((2, 14), np.float32)
    pred[:, 0] = 1
    pred[:, 2:6] = [[0, 0, 10, 10], [200, 200, 210, 210]]  # frame-10 det is a FP
    pred[:, 13] = [0.9, 0.9]  # tied scores
    got = compute_map({"s": (y_pred, pred)}, {"s": (y_gt, gt)})
    assert abs(got - 0.25) < 1e-9
