"""Graph-engine transition tests: the SURVEY.md 3.5 index-order invariants."""

import numpy as np
import pytest

from trackmpnn_tpu.graph import engine


def seq_y():
    """7 detections over 3 frames.
    frame0: det0 (trk1), det1 (trk2), det2 (FP)
    frame1: det3 (trk1), det4 (trk2)
    frame2: det5 (trk2), det6 (trk3)
    """
    return np.array(
        [[0, 1], [0, 2], [0, -1], [1, 1], [1, 2], [2, 2], [2, 3]], dtype=np.int64
    )


def test_initialize_structure():
    g = engine.initialize(seq_y(), 0, "train")
    assert g.n == 3 + 3 * 2 + 2
    # slot order: [dets_t0 | edges i*n1+j | dets_t1]
    assert list(g.ts[:3]) == [0, 0, 0]
    assert list(g.ts[3:9]) == [-1] * 6
    assert list(g.ts[9:]) == [1, 1]
    assert list(g.det_id[:3]) == [0, 1, 2] and list(g.det_id[9:]) == [3, 4]
    # edge (i, j) at row 3 + i*2 + j
    assert g.past[3] == 0 and g.fut[3] == 9
    assert g.past[8] == 2 and g.fut[8] == 10
    # labels: dets TP flags; positive edges only for same-track pairs
    assert list(g.label[:3]) == [1, 1, 0]
    assert list(g.label[9:]) == [1, 1]
    assert list(g.label[3:9]) == [1, 0, 0, 1, 0, 0]  # (d0,d3) and (d1,d4)
    assert g.t_next == 2 and g.t_end == 3


def test_initialize_none_cases():
    # single frame -> None
    assert engine.initialize(np.array([[0, 1], [0, 2]], np.int64), 0, "test") is None
    # all FP in train mode -> None
    y = np.array([[0, -1], [1, -1]], np.int64)
    assert engine.initialize(y, 0, "train") is None
    assert engine.initialize(y, 0, "test") is not None
    # t_st beyond sequence -> None
    assert engine.initialize(seq_y(), 5, "test") is None


def test_teacher_forced_update():
    y = seq_y()
    g = engine.initialize(y, 0, "train")
    n_new = engine.update(g, y, 2, None, mode="train")
    # association pass first: d0 -> det3, d1 -> det4, FP self-associates
    assert g.ass_id[0] == 3 and g.ass_id[1] == 4 and g.ass_id[2] == 2
    assert g.ass_id[9] == -1 and g.ass_id[10] == -1
    # active = unassociated TPs + previous frame = rows 9, 10
    # new rows: 2 active x 2 new dets edges + 2 dets
    assert n_new == 6 and g.n == 17
    assert g.past[11] == 9 and g.fut[11] == 15   # (d3, det5)
    assert g.past[14] == 10 and g.fut[14] == 16  # (d4, det6)
    assert list(g.det_id[15:]) == [5, 6]
    # labels: only (d4 -> det5) positive (both track 2)
    assert list(g.label[11:15]) == [0, 0, 1, 0]
    assert list(g.label[15:]) == [1, 1]


def test_fp_from_prev_frame_is_active():
    """Train mode: the whole previous frame is active, even self-associated FPs
    (ref graph.py:273-274)."""
    y = np.array([[0, 1], [1, 1], [1, -1], [2, 1]], np.int64)
    g = engine.initialize(y, 0, "train")
    # rows: d0 | e(d0,d1) e(d0,d2fp) | d1 d2fp  -> n = 1 + 2 + 2 = 5
    engine.update(g, y, 2, None, mode="train")
    # active: d1 (unassociated TP, row 3) and d2fp (row 4, prev frame)
    pasts = set(int(p) for p in g.past[5:7])
    assert pasts == {3, 4}


def scores_from_labels(g, fp_rows=()):
    s = np.zeros((g.n, 2), np.float32)
    s[:, 1] = np.where(g.label == 1, 0.9, 0.1)
    for r in fp_rows:
        s[r, 1] = 0.4
    s[:, 0] = 1 - s[:, 1]
    return s


def test_greedy_association_nearest_frame():
    """A detection with positive edges to two future frames must pick the
    nearest frame's edge even if a later edge scores higher."""
    y = np.array([[0, 1], [1, 1], [2, 1]], np.int64)
    g = engine.initialize(y, 0, "test")
    engine.update(g, y, 2, scores_from_labels(g), mode="test", use_hungarian=False)
    # rows: d0 | e01 | d1 | e(d0,d2)? -- d0 associated to d1 already? No:
    # update at t=2 associates first; active set then gets edges to frame 2.
    assert g.ass_id[0] == 1
    s = np.zeros((g.n, 2), np.float32)
    s[:, 1] = 0.9
    s[:, 0] = 0.1
    # craft: d0 has edges to frame1 (row 1, p=0.6) and frame2 (p=0.95)
    # after the first update d0 was associated, so rebuild a fresh world:
    y2 = np.array([[0, 1], [1, 1], [2, 1]], np.int64)
    g2 = engine.initialize(y2, 0, "test")
    # force update with scores that leave d0 unassociated: edge (d0,d1) low
    s2 = np.zeros((g2.n, 2), np.float32)
    s2[:, 1] = np.array([0.9, 0.3, 0.9])  # d0, e01, d1
    s2[:, 0] = 1 - s2[:, 1]
    engine.update(g2, y2, 2, s2, mode="test", use_hungarian=False)
    # d0 unassociated and active; d1 active: edges to d2 from both
    assert g2.n == 3 + 2 + 1
    s3 = np.zeros((g2.n, 2), np.float32)
    #          d0   e01  d1   e(d0,d2) e(d1,d2) d2
    s3[:, 1] = [0.9, 0.95, 0.9, 0.8,    0.7,     0.9]
    s3[:, 0] = 1 - s3[:, 1]
    engine.associate_greedy(g2, s3)
    # d0's nearest-frame candidates: e01 (frame 1) wins over e(d0,d2)
    assert g2.ass_id[0] == 1
    assert g2.ass_id[2] == 2  # d1 -> d2 via e(d1,d2)


def test_hungarian_optimality_and_threshold():
    y = np.array([[0, 1], [0, 2], [1, 1], [1, 2]], np.int64)
    g = engine.initialize(y, 0, "test")
    # rows: d0 d1 | e(0,2)=2 e(0,3)=3 e(1,2)=4 e(1,3)=5 | d2=6 d3=7
    s = np.zeros((g.n, 2), np.float32)
    # costs C = 1-p: [[.10, .15], [.12, 1.0]] -> greedy row-wise would pick
    # d0->d2; the global optimum is d0->d3 (0.15) + d1->d2 (0.12)
    s[:, 1] = [0.9, 0.9, 0.9, 0.85, 0.88, 0.0, 0.9, 0.9]
    s[:, 0] = 1 - s[:, 1]
    engine.associate_hungarian(g, s)
    assert g.ass_id[0] == 3 and g.ass_id[1] == 2
    # threshold: cost > 0.5 -> no association
    s[:, 1] = [0.9, 0.9, 0.3, 0.2, 0.2, 0.3, 0.9, 0.9]
    s[:, 0] = 1 - s[:, 1]
    engine.associate_hungarian(g, s)
    assert g.ass_id[0] == -1 and g.ass_id[1] == -1


def test_decode_finalize_and_shrink():
    y = seq_y()
    g = engine.initialize(y, 0, "test")
    s = scores_from_labels(g, fp_rows=[2])
    engine.update(g, y, 2, s, mode="test", use_hungarian=False)
    s = scores_from_labels(g, fp_rows=[2])
    y_out = y.copy()
    y_out[:, 1] = -1
    keep = engine.decode_tracks(g, s, y_out, t_upto=2, ret_win_size=0, use_hungarian=False)
    # track 0: det0 -> det3; track 1: det1 -> det4 -> det5 (chain crosses t_upto)
    assert list(y_out[:, 1]) == [0, 1, -1, 0, 1, 1, -1]
    # window shrinks to frame-2 dets only, renumbered
    assert g.n == 2
    assert list(g.det_id) == [5, 6]
    assert list(keep) == [15, 16]


def test_decode_retains_unassociated_tp():
    """An unassociated TP inside the retain window must survive decode
    (the re-id-after-occlusion mechanism, ref graph.py:499-512)."""
    y = np.array([[0, 1], [0, 2], [1, 1], [2, 1]], np.int64)
    g = engine.initialize(y, 0, "test")
    # d1 (track 2) never reappears -> stays unassociated
    s = scores_from_labels(g)
    engine.update(g, y, 2, s, mode="test", use_hungarian=False)
    s = scores_from_labels(g)
    y_out = y.copy()
    y_out[:, 1] = -1
    engine.decode_tracks(g, s, y_out, t_upto=1, ret_win_size=3, use_hungarian=False)
    # d1 (ts=0, unassociated TP, within ret window) is retained
    assert 1 in list(g.det_id)
    # its dangling edges to the surviving region are kept too
    kept_edges = np.where(g.ts == -1)[0]
    assert all(g.past[e] >= 0 and g.fut[e] >= 0 for e in kept_edges)
    # d0 was associated -> deleted, and its future edges deleted with it
    assert 0 not in list(g.det_id)


def test_update_empty_frame_is_association_only():
    y = np.array([[0, 1], [1, 1], [3, 1]], np.int64)
    g = engine.initialize(y, 0, "test")
    n = g.n
    s = scores_from_labels(g)
    added = engine.update(g, y, 2, s, mode="test", use_hungarian=False)
    assert added == 0 and g.n == n
    assert g.ass_id[0] == 1  # association still ran


def test_prune_drops_low_score_edges():
    y = seq_y()
    g = engine.initialize(y, 0, "test")
    s = scores_from_labels(g)
    n0 = g.n
    keep = engine.prune(g, s, 0, 1, threshold=0.5)
    # negative-label edges (score 0.1) inside [0,1] are dropped; dets stay
    assert g.n == n0 - 4  # 6 edges, 2 positive
    assert np.all(g.ts[g.ts != -1] >= 0)
    er = np.where(g.ts == -1)[0]
    assert all(g.past[e] >= 0 and g.fut[e] >= 0 for e in er)
    assert len(keep) == g.n
