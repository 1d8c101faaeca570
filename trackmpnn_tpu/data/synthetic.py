"""Deterministic synthetic MOT sequences for tests and benchmarks.

Replaces the KITTI file tree in environments without data (the reference
has no tests at all; SURVEY.md 4 calls for a detection simulator driving
the pipeline end-to-end).  Produces the same interface as the real
datasets: per-sequence (features, bbox_pred, bbox_gt) with bbox rows
[fr, trk_id, cat_id, alpha, x1, y1, x2, y2, h, w, l, x, y, z, rot, score]
(ref kitti_mot.py:304-308) and 2d-branch features
[one-hot category | score, xc, yc, w, h] (kitti_mot.py:547-552).
"""

from __future__ import annotations

import numpy as np

IM_W, IM_H = 1242, 375


def make_sequence(
    num_tracks: int = 6,
    num_frames: int = 20,
    ncategories: int = 3,
    fp_rate: float = 0.15,
    miss_rate: float = 0.1,
    seed: int = 5,
    noise: float = 2.0,
):
    """Linear-motion tracks with noisy detections, misses, and FPs.

    Returns (features f32[N,F], bbox_pred f32[N,16], bbox_gt f32[M,16]).
    bbox_pred[:, 1] already carries the GT-assigned track id (-1 for FPs),
    i.e. the output of the IoU assignment stage (kitti_mot.py:422-486).
    """
    rng = np.random.default_rng(seed)
    # track birth/death, start boxes, velocities
    birth = rng.integers(0, max(num_frames // 3, 1), num_tracks)
    death = rng.integers(2 * num_frames // 3, num_frames, num_tracks) + 1
    cx0 = rng.uniform(100, IM_W - 100, num_tracks)
    cy0 = rng.uniform(100, IM_H - 100, num_tracks)
    w = rng.uniform(40, 120, num_tracks)
    h = rng.uniform(30, 90, num_tracks)
    vx = rng.uniform(-8, 8, num_tracks)
    vy = rng.uniform(-3, 3, num_tracks)
    cat = rng.integers(1, ncategories + 1, num_tracks)

    pred_rows, gt_rows = [], []
    for fr in range(num_frames):
        for k in range(num_tracks):
            if not (birth[k] <= fr < death[k]):
                continue
            cx = cx0[k] + vx[k] * fr
            cy = cy0[k] + vy[k] * fr
            box = [cx - w[k] / 2, cy - h[k] / 2, cx + w[k] / 2, cy + h[k] / 2]
            gt_rows.append([fr, k, cat[k], 0.0, *box, -1, -1, -1, -1000, -1000, -1000, -10, 1.0])
            if rng.random() < miss_rate:
                continue
            nb = [b + rng.normal(0, noise) for b in box]
            score = float(np.clip(rng.normal(0.9, 0.05), 0.5, 1.0))
            pred_rows.append([fr, k, cat[k], -10.0, *nb, -1, -1, -1, -1000, -1000, -1000, -10, score])
        # false positives
        n_fp = rng.poisson(fp_rate * num_tracks)
        for _ in range(n_fp):
            fw, fh = rng.uniform(30, 100), rng.uniform(20, 80)
            fx, fy = rng.uniform(0, IM_W - fw), rng.uniform(0, IM_H - fh)
            score = float(np.clip(rng.normal(0.6, 0.1), 0.3, 1.0))
            pred_rows.append(
                [fr, -1, rng.integers(1, ncategories + 1), -10.0,
                 fx, fy, fx + fw, fy + fh, -1, -1, -1, -1000, -1000, -1000, -10, score]
            )

    bbox_pred = np.array(pred_rows, np.float32) if pred_rows else np.zeros((0, 16), np.float32)
    bbox_gt = np.array(gt_rows, np.float32) if gt_rows else np.zeros((0, 16), np.float32)
    # stable frame-major order, FPs interleaved as produced
    if bbox_pred.shape[0]:
        order = np.argsort(bbox_pred[:, 0], kind="stable")
        bbox_pred = bbox_pred[order]
    features = features_2d(bbox_pred, ncategories)
    return features, bbox_pred, bbox_gt


CAT_NAMES = {1: "Pedestrian", 2: "Car", 3: "Cyclist"}


def write_kitti_tree(
    root: str,
    num_seqs: int = 21,
    num_frames: int = 30,
    num_tracks: int = 6,
    split_dir: str = "training",
    detections: str = "rrc",
    seed: int = 0,
    real_images: bool = False,
    **seq_kwargs,
):
    """Render synthetic sequences into a KITTI MOT file tree (image
    placeholders for frame counting, per-frame detection CSVs, 17-column
    label files) so the full dataset pipeline - parsing, IoU track-id
    assignment, chunking - runs end-to-end without real data.

    With `real_images=True` every frame is a decodable IM_W x IM_H PNG
    (one encode, bytes reused) so code that actually opens the images —
    e.g. the reference loader's PIL.Image.open at
    /root/reference/dataset/kitti_mot.py:510 — runs on the same tree."""
    import os

    png_bytes = None
    if real_images:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (IM_W, IM_H), (96, 96, 96)).save(buf, format="PNG")
        png_bytes = buf.getvalue()

    for s in range(num_seqs):
        seq = "%04d" % s
        imdir = os.path.join(root, split_dir, "image_02", seq)
        detdir = os.path.join(root, split_dir, f"{detections}_detections", seq)
        os.makedirs(imdir, exist_ok=True)
        os.makedirs(detdir, exist_ok=True)
        _, bbox_pred, bbox_gt = make_sequence(
            num_tracks=num_tracks, num_frames=num_frames, seed=seed + s,
            **seq_kwargs,
        )
        label_lines = []
        for fr in range(num_frames):
            if png_bytes is not None:
                with open(os.path.join(imdir, "%.6d.png" % fr), "wb") as imf:
                    imf.write(png_bytes)
            else:
                open(os.path.join(imdir, "%.6d.png" % fr), "ab").close()
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                for b in bbox_pred[bbox_pred[:, 0] == fr]:
                    name = CAT_NAMES[int(b[2])]
                    f.write(f"{name},{b[4]:.2f},{b[5]:.2f},{b[6]:.2f},"
                            f"{b[7]:.2f},{b[15]:.3f}\n")
            for b in bbox_gt[bbox_gt[:, 0] == fr]:
                name = CAT_NAMES[int(b[2])]
                label_lines.append(
                    f"{fr} {int(b[1])} {name} 0 0 {b[3]:.2f} {b[4]:.2f} "
                    f"{b[5]:.2f} {b[6]:.2f} {b[7]:.2f} 1.5 1.6 3.7 1.0 1.0 "
                    f"10.0 0.1"
                )
        labdir = os.path.join(root, split_dir, "label_02")
        os.makedirs(labdir, exist_ok=True)
        with open(os.path.join(labdir, seq + ".txt"), "w") as f:
            f.write("\n".join(label_lines) + "\n")


def features_2d(bbox_pred: np.ndarray, ncategories: int) -> np.ndarray:
    """2d-branch features: one-hot category + [score, xc, yc, w, h], standardized."""
    n = bbox_pred.shape[0]
    if n == 0:
        return np.zeros((0, ncategories + 5), np.float32)
    onehot = np.eye(ncategories, dtype=np.float32)[
        np.clip(bbox_pred[:, 2].astype(np.int64) - 1, 0, ncategories - 1)
    ]
    xc = (bbox_pred[:, 4] + bbox_pred[:, 6]) / 2
    yc = (bbox_pred[:, 5] + bbox_pred[:, 7]) / 2
    bw = bbox_pred[:, 6] - bbox_pred[:, 4]
    bh = bbox_pred[:, 7] - bbox_pred[:, 5]
    two_d = np.stack([bbox_pred[:, 15], xc, yc, bw, bh], 1).astype(np.float32)
    feats = np.concatenate([onehot, two_d], 1)
    mean = np.array([0.5] * ncategories + [0.85, IM_W / 2, IM_H / 2, 80.0, 55.0], np.float32)
    std = np.array([0.5] * ncategories + [0.15, IM_W / 4, IM_H / 8, 60.0, 40.0], np.float32)
    return (feats - mean) / std


# --------------------------------------------------------------------------
# Appearance-relevant synthetic MOT (round 4, BASELINE config 5 evidence).
#
# make_sequence's linear tracks are separable from 2d geometry alone, so a
# `2d` model saturates and visual features cannot show their worth.  This
# generator builds CROSSING track pairs with an occlusion gap at the
# crossing: the pair shares one box size and swaps sides mid-sequence
# while one member's detections are dropped for `gap` frames around the
# cross, so geometric matching faces a genuinely ambiguous re-association
# (straight-through vs bounce-back cost the same) that only appearance -
# each identity carries a distinct texture rendered into the frames -
# can disambiguate (the reference's motivation for `vis` feats,
# /root/reference/dataset/kitti_mot.py:119-132).


def make_crossing_sequence(
    num_pairs: int = 3,
    num_frames: int = 24,
    seed: int = 0,
    noise: float = 1.0,
    gap: int = 2,
    miss_rate: float = 0.02,
):
    """Crossing-pair tracks.  Returns (bbox_pred, bbox_gt, colors[T,3])."""
    rng = np.random.default_rng(seed)
    T = 2 * num_pairs
    pred_rows, gt_rows = [], []
    # distinct, saturated per-identity colors (fixed hue walk)
    colors = np.zeros((T, 3), np.uint8)
    for k in range(T):
        h = (0.137 + k * 0.618034) % 1.0
        i = int(h * 6)
        f = h * 6 - i
        v, p, q, t = 255, 40, int(255 - 215 * f), int(40 + 215 * f)
        colors[k] = [(v, t, p), (q, v, p), (p, v, t),
                     (p, q, v), (t, p, v), (v, p, q)][i % 6]

    y_rows = np.linspace(90, IM_H - 90, num_pairs)
    for pk in range(num_pairs):
        a, b = 2 * pk, 2 * pk + 1
        w = float(rng.uniform(60, 90))
        h = float(rng.uniform(45, 70))
        y = float(y_rows[pk] + rng.uniform(-10, 10))
        x_lo, x_hi = 140.0, IM_W - 140.0
        cross = num_frames // 2 + int(rng.integers(-2, 3))
        vx = (x_hi - x_lo) / (num_frames - 1)
        occ_lo, occ_hi = cross - gap, cross + gap
        for fr in range(num_frames):
            xa = x_lo + vx * fr          # a: left -> right
            xb = x_hi - vx * fr          # b: right -> left
            for tid, xc in ((a, xa), (b, xb)):
                box = [xc - w / 2, y - h / 2, xc + w / 2, y + h / 2]
                gt_rows.append([fr, tid, 2, 0.0, *box,
                                -1, -1, -1, -1000, -1000, -1000, -10, 1.0])
                occluded = tid == a and occ_lo <= fr <= occ_hi
                if occluded or rng.random() < miss_rate:
                    continue
                nb = [c + rng.normal(0, noise) for c in box]
                score = float(np.clip(rng.normal(0.92, 0.04), 0.6, 1.0))
                pred_rows.append([fr, tid, 2, -10.0, *nb, -1, -1, -1,
                                  -1000, -1000, -1000, -10, score])
    bbox_pred = np.array(pred_rows, np.float32)
    bbox_gt = np.array(gt_rows, np.float32)
    order = np.argsort(bbox_pred[:, 0], kind="stable")
    return bbox_pred[order], bbox_gt, colors


def render_frame(bbox_gt_fr, track_ids, colors, w=IM_W, h=IM_H):
    """Draw per-identity textured boxes (flat color + id-striped band)."""
    from PIL import Image, ImageDraw

    im = Image.new("RGB", (w, h), (96, 96, 96))
    dr = ImageDraw.Draw(im)
    for row, tid in zip(bbox_gt_fr, track_ids):
        x1, y1, x2, y2 = [int(v) for v in row[4:8]]
        c = tuple(int(v) for v in colors[int(tid) % len(colors)])
        dr.rectangle([x1, y1, x2, y2], fill=c)
        # identity stripes: phase/period keyed on the id so even similar
        # hues stay separable to a learned embedding
        period = 6 + (int(tid) % 5)
        for sx in range(x1, x2, period):
            dr.line([sx, y1, sx, y2], fill=(255 - c[0], 255 - c[1],
                                            255 - c[2]), width=1)
    return im


def write_kitti_tree_appearance(
    root: str,
    num_seqs: int = 21,
    num_frames: int = 24,
    num_pairs: int = 3,
    seed: int = 0,
    split_dir: str = "training",
    detections: str = "rrc",
    gap: int = 2,
):
    """KITTI tree whose frames carry per-identity textures (config-5
    evidence harness: the same tree trains `2d` and `2d+vis` models)."""
    import os

    for s in range(num_seqs):
        seq = "%04d" % s
        imdir = os.path.join(root, split_dir, "image_02", seq)
        detdir = os.path.join(root, split_dir, f"{detections}_detections", seq)
        os.makedirs(imdir, exist_ok=True)
        os.makedirs(detdir, exist_ok=True)
        bbox_pred, bbox_gt, colors = make_crossing_sequence(
            num_pairs=num_pairs, num_frames=num_frames, seed=seed + 7 * s,
            gap=gap)
        label_lines = []
        for fr in range(num_frames):
            gt_fr = bbox_gt[bbox_gt[:, 0] == fr]
            im = render_frame(gt_fr, gt_fr[:, 1], colors)
            im.save(os.path.join(imdir, "%.6d.png" % fr))
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                for b in bbox_pred[bbox_pred[:, 0] == fr]:
                    name = CAT_NAMES[int(b[2])]
                    f.write(f"{name},{b[4]:.2f},{b[5]:.2f},{b[6]:.2f},"
                            f"{b[7]:.2f},{b[15]:.3f}\n")
            for b in gt_fr:
                name = CAT_NAMES[int(b[2])]
                label_lines.append(
                    f"{fr} {int(b[1])} {name} 0 0 {b[3]:.2f} {b[4]:.2f} "
                    f"{b[5]:.2f} {b[6]:.2f} {b[7]:.2f} 1.5 1.6 3.7 1.0 1.0 "
                    f"10.0 0.1")
        labdir = os.path.join(root, split_dir, "label_02")
        os.makedirs(labdir, exist_ok=True)
        with open(os.path.join(labdir, seq + ".txt"), "w") as f:
            f.write("\n".join(label_lines) + "\n")


BDD_NAMES = {1: "pedestrian", 2: "car", 3: "bicycle"}


def write_bdd_tree(
    root: str,
    num_seqs: int = 12,
    num_frames: int = 16,
    num_tracks: int = 6,
    split_dir: str = "training",
    detections: str = "libra",
    seed: int = 0,
    real_images: bool = True,
    crowd: bool = True,
    **seq_kwargs,
):
    """Render synthetic sequences into a BDD100K MOT file tree (the
    reference layout: .jpg frames, <det>_detections/<seq>/%.4d.txt CSVs,
    label_02/<seq>.txt 17-column files sorted by frame —
    /root/reference/dataset/bdd100k_mot.py:99-109,250,323).

    With `crowd=True` each sequence gets per-frame 'crowd' (cat -1) and
    'trailer' (distractor, cat 9) GT rows plus matching junk detections,
    exercising the reference's IoM-crowd / IoU-distractor removal
    (bdd100k_mot.py:416-469).  Detection scores are lifted above the 0.8
    load threshold (bdd100k_mot.py:342).  `real_images=True` writes
    decodable JPEGs (one encode, bytes reused)."""
    import os

    jpg_bytes = None
    if real_images:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (IM_W, IM_H), (80, 90, 100)).save(buf, format="JPEG")
        jpg_bytes = buf.getvalue()

    rng = np.random.default_rng(seed + 999)
    for s in range(num_seqs):
        seq = "seq%03d" % s
        imdir = os.path.join(root, split_dir, "image_02", seq)
        detdir = os.path.join(root, split_dir, f"{detections}_detections", seq)
        os.makedirs(imdir, exist_ok=True)
        os.makedirs(detdir, exist_ok=True)
        _, bbox_pred, bbox_gt = make_sequence(
            num_tracks=num_tracks, num_frames=num_frames, seed=seed + s,
            **seq_kwargs)
        label_lines = []
        for fr in range(num_frames):
            if jpg_bytes is not None:
                with open(os.path.join(imdir, "%.4d.jpg" % fr), "wb") as f:
                    f.write(jpg_bytes)
            else:
                open(os.path.join(imdir, "%.4d.jpg" % fr), "ab").close()
            det_lines = []
            for b in bbox_pred[bbox_pred[:, 0] == fr]:
                name = BDD_NAMES[int(b[2])]
                det_lines.append(
                    f"{name},{b[4]:.2f},{b[5]:.2f},{b[6]:.2f},{b[7]:.2f},"
                    f"{max(b[15], 0.85):.3f}")
            for b in bbox_gt[bbox_gt[:, 0] == fr]:
                name = BDD_NAMES[int(b[2])]
                label_lines.append(
                    f"{fr} {int(b[1])} {name} 0 0 0.0 {b[4]:.2f} {b[5]:.2f} "
                    f"{b[6]:.2f} {b[7]:.2f} 1 1 1 1 1 10 0.1")
            if crowd:
                # crowd region (IoM-removes unmatched dets inside it) and a
                # trailer distractor (IoU-removes overlapping FP dets)
                cx = float(rng.uniform(100, IM_W - 300))
                cy = float(rng.uniform(60, IM_H - 160))
                label_lines.append(
                    f"{fr} 900 crowd 0 0 0.0 {cx:.2f} {cy:.2f} "
                    f"{cx + 250:.2f} {cy + 130:.2f} 1 1 1 1 1 10 0.1")
                label_lines.append(
                    f"{fr} 901 trailer 0 0 0.0 {cx + 20:.2f} {cy + 10:.2f} "
                    f"{cx + 120:.2f} {cy + 80:.2f} 1 1 1 1 1 10 0.1")
                # junk detections: one inside the crowd, one on the trailer
                det_lines.append(
                    f"car,{cx + 40:.2f},{cy + 20:.2f},{cx + 130:.2f},"
                    f"{cy + 90:.2f},0.9")
                det_lines.append(
                    f"car,{cx + 25:.2f},{cy + 12:.2f},{cx + 118:.2f},"
                    f"{cy + 78:.2f},0.88")
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                f.write("\n".join(det_lines) + ("\n" if det_lines else ""))
        labdir = os.path.join(root, split_dir, "label_02")
        os.makedirs(labdir, exist_ok=True)
        with open(os.path.join(labdir, seq + ".txt"), "w") as f:
            f.write("\n".join(label_lines) + "\n")
