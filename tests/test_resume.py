"""Warm-start resume: full train state (optimizer, epoch, best metric)
round-trips through --snapshot, unlike the reference's weights-only save."""

import os

from test_datasets import write_kitti_tree


def test_resume_continues_epochs(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=6)

    from trackmpnn_tpu.cli import train as cli_train

    out1 = str(tmp_path / "exp1")
    cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out1, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "2",
        "--num-hidden-feats", "16",
    ])
    ckpt = os.path.join(out1, "track-mpnn_best.npz")

    out2 = str(tmp_path / "exp2")
    history = cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out2, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "4",
        "--num-hidden-feats", "16", "--snapshot", ckpt,
    ])
    # resumed from the best epoch (<=2), so it runs the remaining epochs
    n_resumed = len(history["loss"])
    assert 2 <= n_resumed <= 3, n_resumed
    assert "resumed" in open(os.path.join(out2, "logs.txt")).read()
