"""Dataset tests against a synthetic KITTI/BDD100K file tree."""

import json
import os

import numpy as np
import pytest

from trackmpnn_tpu.data import bdd100k, common, kitti


def write_kitti_tree(root, num_seqs=21, frames=6):
    """Minimal KITTI MOT layout; sequence 0000-0020 (the split logic slices
    into 21 sequences)."""
    for s in range(num_seqs):
        seq = "%04d" % s
        imdir = os.path.join(root, "training", "image_02", seq)
        os.makedirs(imdir, exist_ok=True)
        detdir = os.path.join(root, "training", "rrc_detections", seq)
        os.makedirs(detdir, exist_ok=True)
        labels = []
        for fr in range(frames):
            open(os.path.join(imdir, "%.6d.png" % fr), "wb").close()
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                # two moving cars + an FP far away
                f.write(f"Car,{100 + 5 * fr},100,{160 + 5 * fr},140,0.95\n")
                f.write(f"Car,{300 - 5 * fr},150,{360 - 5 * fr},190,0.9\n")
                f.write("Car,700,50,730,80,0.6\n")
            # GT: same two tracks; one DontCare region over the FP
            labels.append(
                f"{fr} 1 Car 0 0 -10 {100 + 5 * fr} 100 {160 + 5 * fr} 140 1.5 1.6 3.7 1 1 10 0.1"
            )
            labels.append(
                f"{fr} 2 Car 0 0 -10 {300 - 5 * fr} 150 {360 - 5 * fr} 190 1.5 1.6 3.7 1 1 10 0.1"
            )
            labels.append(f"{fr} -1 DontCare -1 -1 -10 695 45 735 85 -1 -1 -1 -1000 -1000 -1000 -10")
        os.makedirs(os.path.join(root, "training", "label_02"), exist_ok=True)
        with open(os.path.join(root, "training", "label_02", seq + ".txt"), "w") as f:
            f.write("\n".join(labels) + "\n")


def test_kitti_dataset_loads(tmp_path):
    write_kitti_tree(str(tmp_path))
    ds = kitti.KittiMOTDataset(str(tmp_path), "train", "Car", "rrc", "2d",
                               cur_win_size=4, ret_win_size=2, seed=5)
    assert len(ds) > 0
    feats, bbox_pred, bbox_gt, _ = ds[0]
    assert feats.shape[1] == 3 + 5  # one-hot(3) + [score, xc, yc, w, h]
    # track ids assigned; FP inside DontCare removed
    assert set(np.unique(bbox_pred[:, 1])) <= {1.0, 2.0}
    assert bbox_pred.shape[0] == bbox_gt.shape[0]  # FP was inside ignore region
    # features standardized: finite, reasonable scale
    assert np.all(np.isfinite(feats)) and np.abs(feats).max() < 20


def test_kitti_dataset_temp_feats(tmp_path):
    write_kitti_tree(str(tmp_path))
    ds = kitti.KittiMOTDataset(str(tmp_path), "train", "Car", "rrc", "2d+temp",
                               cur_win_size=4, seed=5)
    feats, _, _, _ = ds[0]
    assert feats.shape[1] == 3 + 5 + 2


def test_kitti_val_split_whole_sequences(tmp_path):
    write_kitti_tree(str(tmp_path))
    ds = kitti.KittiMOTDataset(str(tmp_path), "val", "Car", "rrc", "2d")
    assert len(ds) == 3  # seqs 16, 18, 20
    _, bbox_pred, _, _ = ds[0]
    assert bbox_pred[:, 0].max() == 5  # whole sequence


def test_kitti_writer_car_filter(tmp_path):
    class_dict = {"Pedestrian": 1, "Car": 2, "Cyclist": 3}
    bbox = np.zeros((4, 14), np.float32)
    bbox[:, 0] = 2  # Car
    bbox[:, 2:6] = [[0, 0, 10, 10]] * 4
    bbox[:2, 13] = 0.9   # track 0: high score
    bbox[2:, 13] = 0.5   # track 1: low score -> dropped
    y_out = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.int64)
    out = str(tmp_path / "0000.txt")
    kitti.store_kitti_results(bbox, y_out, class_dict, out)
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2
    assert all(" Car " in l for l in lines)


def write_bdd_tree(root, seqs=2, frames=5):
    for s in range(seqs):
        seq = "seq%02d" % s
        imdir = os.path.join(root, "training", "image_02", seq)
        detdir = os.path.join(root, "training", "libra_detections", seq)
        os.makedirs(imdir, exist_ok=True)
        os.makedirs(detdir, exist_ok=True)
        labels = []
        for fr in range(frames):
            open(os.path.join(imdir, "%.4d.jpg" % fr), "wb").close()
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                f.write(f"car,{50 + 4 * fr},60,{110 + 4 * fr},100,0.95\n")
                f.write("car,400,200,460,240,0.5\n")       # below 0.8 -> dropped
                f.write("pedestrian,600,100,620,160,0.9\n")
            labels.append(f"{fr} 3 car 0 0 -10 {50 + 4 * fr} 60 {110 + 4 * fr} 100 1 1 1 1 1 10 0.1")
            labels.append(f"{fr} 7 pedestrian 0 0 -10 600 100 620 160 1 1 1 1 1 10 0.1")
        os.makedirs(os.path.join(root, "training", "label_02"), exist_ok=True)
        with open(os.path.join(root, "training", "label_02", seq + ".txt"), "w") as f:
            f.write("\n".join(labels) + "\n")


def test_bdd_dataset_loads(tmp_path):
    write_bdd_tree(str(tmp_path))
    ds = bdd100k.BDD100kMOTDataset(str(tmp_path), "train", "All", "libra", "2d",
                                   cur_win_size=3, seed=5)
    feats, bbox_pred, bbox_gt, _ = ds[0]
    assert feats.shape[1] == 8 + 5
    # low-score detection dropped, others assigned
    assert np.all(bbox_pred[:, 15] > 0.8)
    assert set(np.unique(bbox_pred[:, 1])) <= {3.0, 7.0}


def test_bdd_writer_json(tmp_path):
    bbox = np.zeros((2, 14), np.float32)
    bbox[:, 0] = [3, 1]
    bbox[:, 2:6] = [[1, 2, 3, 4], [5, 6, 7, 8]]
    y_out = np.array([[0, 0], [0, 1]], np.int64)
    out = str(tmp_path / "res.json")
    bdd100k.store_bdd100k_results(bbox, y_out, bdd100k.CLASS_DICT, out)
    data = json.load(open(out))
    assert data[0]["frameIndex"] == 0
    cats = {l["category"] for l in data[0]["labels"]}
    assert cats == {"car", "pedestrian"}


def test_assign_track_ids_class_must_match():
    pred = np.zeros((1, 16), np.float32)
    pred[0, 1] = -1
    pred[0, 2] = 1  # Pedestrian
    pred[0, 4:8] = [0, 0, 10, 10]
    gt = np.zeros((1, 16), np.float32)
    gt[0, 1] = 5
    gt[0, 2] = 2  # Car: same box, different class -> no assignment
    gt[0, 4:8] = [0, 0, 10, 10]
    p, g = common.assign_track_ids(pred.copy(), gt.copy())
    assert p[0, 1] == -1


def test_chunk_skip_pair():
    import random

    chunks = common.make_chunks(["a"], [30], "train", 5, 10, stride=2,
                                rng=random.Random(0))
    # every chunk is window + optional skip-pair of 2 consecutive frames
    for _, frs in chunks:
        base = [f for f in frs[:5]]
        assert base == sorted(base)
        if len(frs) > 5 and len(frs) - len(base) == 2:
            assert frs[-1] == frs[-2] + 1
            assert frs[-2] >= base[0] + 5
