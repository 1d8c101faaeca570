"""CLI drivers end-to-end on a synthetic KITTI tree: train -> checkpoint ->
infer -> result files, plus config inheritance."""

import json
import os

import numpy as np
import pytest

from test_datasets import write_kitti_tree


def write_kitti_test_tree(root, num_seqs=2, frames=5):
    for s in range(num_seqs):
        seq = "%04d" % s
        imdir = os.path.join(root, "testing", "image_02", seq)
        detdir = os.path.join(root, "testing", "rrc_detections", seq)
        os.makedirs(imdir, exist_ok=True)
        os.makedirs(detdir, exist_ok=True)
        for fr in range(frames):
            open(os.path.join(imdir, "%.6d.png" % fr), "wb").close()
            with open(os.path.join(detdir, "%.4d.txt" % fr), "w") as f:
                f.write(f"Car,{100 + 5 * fr},100,{160 + 5 * fr},140,0.95\n")
                f.write(f"Car,{300 - 5 * fr},150,{360 - 5 * fr},190,0.9\n")


def test_train_then_infer(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=6)
    write_kitti_test_tree(root)
    out_train = str(tmp_path / "exp_train")

    from trackmpnn_tpu.cli import train as cli_train

    history = cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out_train, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "2",
        "--learning-rate", "0.001", "--num-hidden-feats", "16",
    ])
    assert len(history["loss"]) == 2
    assert os.path.exists(os.path.join(out_train, "config.json"))
    ckpt = os.path.join(out_train, "track-mpnn_best.npz")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(out_train, "logs.txt"))

    from trackmpnn_tpu.cli import infer as cli_infer

    out_infer = str(tmp_path / "exp_infer")
    cli_infer.main([
        "--snapshot", ckpt, "--dataset-root-path", root,
        "--output-dir", out_infer,
    ])
    # config inherited from training
    cfg = json.load(open(os.path.join(out_infer, "config.json")))
    assert cfg["feats"] == "2d" and cfg["num_hidden_feats"] == 16
    results = [f for f in os.listdir(out_infer) if f.endswith(".txt")]
    assert len(results) == 2
    # result files parse as KITTI rows
    for f in results:
        for line in open(os.path.join(out_infer, f)):
            parts = line.split(" ")
            assert len(parts) == 18 and parts[2] == "Car"

    from trackmpnn_tpu.cli import ablation as cli_ablation

    m = cli_ablation.main([
        "--snapshot", ckpt, "--dataset-root-path", root,
        "--output-dir", str(tmp_path / "exp_abl"),
    ])
    assert "mota" in m and "idf1" in m


def test_output_dir_refuses_overwrite(tmp_path):
    from trackmpnn_tpu.utils.config import parse_train_args

    out = str(tmp_path / "exp")
    os.makedirs(out)
    with pytest.raises(FileExistsError):
        parse_train_args(["--output-dir", out, "--dataset-root-path", "/nonexistent"])


def test_train_all_centertrack(tmp_path):
    """BASELINE config 2 surface: --category All --detections centertrack
    (same file format as rrc in the reference — kitti_mot.py:342-364 — but
    its own normalization table and the multi-class one-hot head)."""
    from trackmpnn_tpu.data.synthetic import write_kitti_tree as lib_tree

    root = str(tmp_path / "kitti")
    lib_tree(root, num_seqs=21, num_frames=6, detections="centertrack",
             num_tracks=4, seed=3)
    out = str(tmp_path / "exp_ct")

    from trackmpnn_tpu.cli import train as cli_train

    history = cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out, "--category", "All",
        "--detections", "centertrack", "--feats", "2d+temp",
        "--cur-win-size", "4", "--epochs", "1",
        "--learning-rate", "0.001", "--num-hidden-feats", "16",
    ])
    assert len(history["loss"]) == 1 and np.isfinite(history["loss"][0])
    assert os.path.exists(os.path.join(out, "track-mpnn_best.npz"))
