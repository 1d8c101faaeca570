"""BDD100K MOT dataset (behavioral spec: /root/reference/dataset/
bdd100k_mot.py).  Differences from KITTI:

  * 8 tracked classes + distractor categories (id 9) + crowd regions (-1),
    handled as remove-by-IoU / ignore-by-IoM respectively
    (bdd100k_mot.py:416-469);
  * detections below score 0.8 are dropped at load (bdd100k_mot.py:342);
  * .jpg frames, %04d naming, separate validation/ directory;
  * training chunk stride = cur_win_size (not half, bdd100k_mot.py:210);
  * missing per-frame detection files are silently empty
    (bdd100k_mot.py:322-325);
  * results are written as BDD100K-style JSON.
"""

from __future__ import annotations

import glob
import json
import os
import random
from typing import Callable, Optional

import numpy as np

from trackmpnn_tpu.data import common

CLASS_DICT = {
    "pedestrian": 1, "rider": 2, "car": 3, "bus": 4,
    "truck": 5, "train": 6, "motorcycle": 7, "bicycle": 8,
}
DISTRACTORS = {"other person": 9, "trailer": 9, "other vehicle": 9, "crowd": -1}
CAT_IDS = {**CLASS_DICT, **DISTRACTORS}
DISTRACT_ID, CROWD_ID = 9, -1

NORM_2D = {
    "hin": ([0.94, 545.84, 329.28, 85.19, 71.47], [0.07, 294.88, 81.51, 93.51, 75.72]),
    "libra": ([0.94, 545.84, 329.28, 85.19, 71.47], [0.07, 294.88, 81.51, 93.51, 75.72]),
}

SPLIT_DIRS = {"train": "training", "val": "validation", "test": "testing"}


class BDD100kMOTDataset:
    def __init__(
        self,
        root: str,
        split: str = "train",
        cat: str = "All",
        detections: str = "libra",
        feats: str = "2d",
        cur_win_size: int = 5,
        ret_win_size: int = 0,
        random_transforms: bool = False,
        embed_fn: Optional[Callable] = None,
        down_ratio: int = 1,
        input_hw=(720, 1280),
        num_vis_feats: int = 128,
        default_im_hw=(720, 1280),
        score_threshold: float = 0.8,
        seed: Optional[int] = None,
        defer_vis: bool = False,
    ):
        self.root = root
        self.split = split
        self.class_dict = dict(CLASS_DICT)
        if cat == "All":
            self.cats = list(CLASS_DICT) + list(DISTRACTORS)
        else:
            self.cats = [cat] + list(DISTRACTORS)
        self.detections = detections
        self.feats = feats
        self.cur_win_size = cur_win_size
        self.ret_win_size = ret_win_size
        self.random_transforms = random_transforms
        self.embed_fn = embed_fn
        if "vis" in feats and embed_fn is None and not defer_vis:
            raise ValueError(
                "feats includes 'vis' but no embed_fn was given and "
                "defer_vis is off - appearance features would crash at the "
                "first __getitem__; pass embed_fn=... or defer_vis=True")
        self.down_ratio = down_ratio
        self.input_hw = input_hw
        self.num_vis_feats = num_vis_feats
        self.default_im_hw = default_im_hw
        # per-sequence caches: the label file was re-opened and linearly
        # re-scanned for EVERY frame (O(frames^2) parsing per epoch with
        # overlapping chunks), and the image re-opened per frame just for
        # its constant size
        self._label_cache: dict = {}
        self._im_hw_cache: dict = {}
        self.score_threshold = score_threshold
        self.dropout_ratio = 0.2
        self.fr_range = 30
        self.defer_vis = defer_vis
        self._rng = random.Random(seed)

        sub = SPLIT_DIRS[split]
        self.im_path = os.path.join(root, sub, "image_02")
        self.label_path = None if split == "test" else os.path.join(root, sub, "label_02")
        self.det_path = os.path.join(root, sub, detections + "_detections")

        seqs = sorted(os.listdir(self.im_path))
        num_frames = [len(glob.glob(os.path.join(self.im_path, s, "*.jpg"))) for s in seqs]
        self.chunks = common.make_chunks(
            seqs, num_frames, split, cur_win_size, ret_win_size,
            stride=cur_win_size, rng=self._rng,
        )

        mean_2d, std_2d = NORM_2D[detections]
        table_feats = feats.replace("vis", "") if defer_vis else feats
        self.mean, self.std = common.feature_norm_table(
            table_feats, len(self.class_dict), mean_2d, std_2d, num_vis_feats
        )

    def __len__(self):
        return len(self.chunks)

    def _im_size(self, seq, fr):
        # cached per sequence (constant within one)
        if seq in self._im_hw_cache:
            return self._im_hw_cache[seq]
        p = os.path.join(self.im_path, seq, "%.4d.jpg" % fr)
        try:
            import PIL.Image

            with PIL.Image.open(p) as im:
                hw = (im.size[1], im.size[0])
        except Exception:
            hw = self.default_im_hw
        self._im_hw_cache[seq] = hw
        return hw


    def _label_rows(self, seq):
        """Frame-indexed raw token rows of <seq>.txt, parsed once."""
        cached = self._label_cache.get(seq)
        if cached is None:
            cached = {}
            with open(os.path.join(self.label_path, seq + ".txt")) as f:
                for line in f:
                    t = line.strip().split(" ")
                    cached.setdefault(int(t[0]), []).append(t)
            self._label_cache[seq] = cached
        return cached

    def load_labels(self, seq, fr, im_shape, hflip):
        rows = []
        if self.label_path is None:
            return np.zeros((0, 16), np.float32)
        for t in self._label_rows(seq).get(fr, []):
            name = t[2]
            if name not in self.cats:
                continue
            alpha = float(t[5])
            box = [float(t[6]), float(t[7]), float(t[8]), float(t[9])]
            dim = [float(t[10]), float(t[11]), float(t[12])]
            loc = [float(t[13]), float(t[14]), float(t[15])]
            ry = float(t[16])
            if hflip:
                alpha = -alpha
                box = common.hflip_box(box, im_shape[1])
                loc = [-loc[0], loc[1], loc[2]]
                ry = common.hflip_rotation_y(ry)
            rows.append([fr, int(t[1]), CAT_IDS[name], alpha, *box, *dim, *loc, ry, 1.0])
        return np.array(rows, np.float32) if rows else np.zeros((0, 16), np.float32)

    def load_detections(self, seq, fr, im_shape, hflip):
        rows = []
        path = os.path.join(self.det_path, seq, "%.4d.txt" % fr)
        if not os.path.exists(path):
            return np.zeros((0, 16), np.float32)  # silently empty
        with open(path) as f:
            for line in f:
                t = line.strip().split(",")
                name = t[0]
                if name not in self.cats or name in DISTRACTORS:
                    continue
                score = float(t[5])
                if score <= self.score_threshold:
                    continue
                box = [float(t[1]), float(t[2]), float(t[3]), float(t[4])]
                if hflip:
                    box = common.hflip_box(box, im_shape[1])
                rows.append([fr, -1, CAT_IDS[name], -10, *box,
                             -1, -1, -1, -1000, -1000, -1000, -10, score])
        return np.array(rows, np.float32) if rows else np.zeros((0, 16), np.float32)

    def __getitem__(self, index):
        seq, fr_list = self.chunks[index]
        tr = self.random_transforms and self._rng.random() < 0.5
        hf = self.random_transforms and self._rng.random() < 0.5

        preds, gts, vis = [], [], []
        vis_meta = {"images": [], "centers": [], "counts": []} if (
            self.defer_vis and "vis" in self.feats) else None
        for fr in fr_list:
            im_shape = self._im_size(seq, fr)
            gt = self.load_labels(seq, fr, im_shape, hf)
            pred = self.load_detections(seq, fr, im_shape, hf)
            if tr:
                if gt.shape[0]:
                    gt[:, 0] = common.time_reverse(gt[:, 0], fr_list)
                if pred.shape[0]:
                    pred[:, 0] = common.time_reverse(pred[:, 0], fr_list)
            pred, gt = common.assign_track_ids(
                pred, gt, ignore_iom_cats=[CROWD_ID], remove_iou_cats=[DISTRACT_ID]
            )
            if self.random_transforms and pred.shape[0]:
                keep = np.array(
                    [self._rng.random() >= self.dropout_ratio for _ in range(pred.shape[0])]
                )
                pred = pred[keep]
            if "vis" in self.feats:
                im_path = os.path.join(self.im_path, seq, "%.4d.jpg" % fr)
                if vis_meta is not None:
                    cy, cx = common.center_indices(pred[:, 4:8], im_shape,
                                                   self.input_hw, self.down_ratio)
                    vis_meta["images"].append((im_path, hf))
                    vis_meta["centers"].append((cy, cx))
                    vis_meta["counts"].append(pred.shape[0])
                else:
                    fmap = self.embed_fn(im_path, hf)
                    vis.append(common.extract_center_features(
                        np.asarray(fmap), pred[:, 4:8], im_shape, self.input_hw,
                        self.down_ratio
                    ))
            preds.append(pred)
            gts.append(gt)

        bbox_pred = np.concatenate(preds, 0) if preds else np.zeros((0, 16), np.float32)
        bbox_gt = np.concatenate(gts, 0) if gts else np.zeros((0, 16), np.float32)
        feats_str = self.feats.replace("vis", "") if vis_meta is not None else self.feats
        vis_feats = np.concatenate(vis, 0) if vis else None
        features = common.assemble_features(
            bbox_pred, feats_str, len(self.class_dict), self.mean, self.std,
            vis_feats, self.fr_range,
        )
        return features, bbox_pred, bbox_gt, vis_meta if vis_meta is not None else vis_feats


def store_bdd100k_results(bbox_pred, y_out, class_dict, output_path):
    """BDD100K-style JSON writer (ref bdd100k_mot.py:22-67)."""
    inv = {v: k for k, v in class_dict.items()}
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    t_lo, t_hi = int(y_out[:, 0].min()), int(y_out[:, 0].max())
    data = []
    for t in range(t_lo, t_hi + 1):
        ids = np.where((y_out[:, 0] == t) & (y_out[:, 1] != -1))[0]
        tracks = y_out[ids, 1].astype(np.int64)
        assert tracks.size == np.unique(tracks).size
        labels = []
        for i in ids:
            b = bbox_pred[i]
            labels.append({
                "id": int(y_out[i, 1]),
                "category": inv[int(b[0])],
                "box2d": {"x1": float(b[2]), "y1": float(b[3]),
                          "x2": float(b[4]), "y2": float(b[5])},
            })
        data.append({
            "name": os.path.basename(output_path),
            "videoName": os.path.basename(output_path),
            "frameIndex": int(t),
            "labels": labels,
        })
    with open(output_path, "w") as f:
        json.dump(data, f)
