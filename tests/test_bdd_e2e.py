"""BDD100K end-to-end through the CLI on a synthetic tree, and the dla34
embedding architecture through the vis training path."""

import os

import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import CAT_NAMES, make_sequence

BDD_NAMES = {1: "pedestrian", 2: "car", 3: "bicycle"}  # subset of the 8


def write_bdd_tree(root, num_seqs=3, num_frames=8, split_dir="training"):
    for s in range(num_seqs):
        seq = "seq%02d" % s
        imdir = os.path.join(root, split_dir, "image_02", seq)
        detdir = os.path.join(root, split_dir, "libra_detections", seq)
        os.makedirs(imdir, exist_ok=True)
        os.makedirs(detdir, exist_ok=True)
        _, bbox_pred, bbox_gt = make_sequence(num_tracks=5, num_frames=num_frames,
                                              seed=50 + s, miss_rate=0.05,
                                              fp_rate=0.1)
        labels = []
        for fr in range(num_frames):
            open(os.path.join(imdir, "%.4d.jpg" % fr), "ab").close()
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                for b in bbox_pred[bbox_pred[:, 0] == fr]:
                    name = BDD_NAMES[int(b[2])]
                    # BDD keeps detections with score > 0.8 only
                    f.write(f"{name},{b[4]:.2f},{b[5]:.2f},{b[6]:.2f},"
                            f"{b[7]:.2f},{max(b[15], 0.85):.3f}\n")
            for b in bbox_gt[bbox_gt[:, 0] == fr]:
                name = BDD_NAMES[int(b[2])]
                labels.append(
                    f"{fr} {int(b[1])} {name} 0 0 {b[3]:.2f} {b[4]:.2f} "
                    f"{b[5]:.2f} {b[6]:.2f} {b[7]:.2f} 1 1 1 1 1 10 0.1")
        labdir = os.path.join(root, split_dir, "label_02")
        os.makedirs(labdir, exist_ok=True)
        with open(os.path.join(labdir, seq + ".txt"), "w") as f:
            f.write("\n".join(labels) + "\n")


def test_bdd_train_and_infer(tmp_path):
    root = str(tmp_path / "bdd")
    write_bdd_tree(root, split_dir="training")
    write_bdd_tree(root, num_seqs=2, split_dir="validation")
    write_bdd_tree(root, num_seqs=2, split_dir="testing")
    out = str(tmp_path / "exp")

    from trackmpnn_tpu.cli import train as cli_train

    history = cli_train.main([
        "--dataset", "bdd100k", "--dataset-root-path", root,
        "--output-dir", out, "--category", "All", "--detections", "libra",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "1",
        "--num-hidden-feats", "16",
    ])
    assert len(history["loss"]) == 1
    ckpt = os.path.join(out, "track-mpnn_best.npz")
    assert os.path.exists(ckpt)

    from trackmpnn_tpu.cli import infer as cli_infer

    out_infer = str(tmp_path / "exp_infer")
    cli_infer.main(["--snapshot", ckpt, "--dataset-root-path", root,
                    "--output-dir", out_infer])
    results = [f for f in os.listdir(out_infer)
               if f.endswith(".json") and f != "config.json"]
    assert len(results) == 2  # BDD writes JSON per sequence


def test_dla34_vis_training(tmp_path):
    """The dla34 embedding path (deformable conv) through EmbedTrainer."""
    import cv2

    from trackmpnn_tpu.train.embed import EmbedTrainer

    imdir = tmp_path / "ims"
    imdir.mkdir()
    rng = np.random.default_rng(2)
    paths = []
    for fr in range(2):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        p = str(imdir / f"{fr}.png")
        cv2.imwrite(p, img)
        paths.append(p)

    et = EmbedTrainer(arch="dla34", num_vis_feats=16, input_hw=(64, 64),
                      max_dets=16)
    assert et.down_ratio == 4
    vis_meta = {
        "images": [(p, False) for p in paths],
        "centers": [(np.array([4, 8]), np.array([4, 8]))] * 2,
        "counts": [2] * 2,
    }
    tids = np.array([0, 1] * 2, np.int32)
    feats, loss = et.train_chunk(vis_meta, tids)
    assert feats.shape == (4, 16)
    assert np.isfinite(loss)
