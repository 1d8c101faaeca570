"""Window-size sweep driver end-to-end on the synthetic KITTI tree."""

import json
import os

from test_datasets import write_kitti_tree


def test_sweep_cli(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=8)
    out_train = str(tmp_path / "exp_train")

    from trackmpnn_tpu.cli import train as cli_train

    cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out_train, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "1",
        "--num-hidden-feats", "16", "--learning-rate", "0.001",
    ])
    ckpt = os.path.join(out_train, "track-mpnn_best.npz")

    from trackmpnn_tpu.cli import sweep as cli_sweep

    out_sweep = str(tmp_path / "exp_sweep")
    results = cli_sweep.main([
        "--snapshot", ckpt, "--dataset-root-path", root,
        "--output-dir", out_sweep, "--win-sizes", "4", "8",
    ])
    assert set(results) == {4, 8}
    data = json.load(open(os.path.join(out_sweep, "window_sweep.json")))
    assert "mota" in data["4"] and "idf1" in data["8"]
