"""--plot-gradients produces gradient-flow images during training."""

import glob
import os

from test_datasets import write_kitti_tree


def test_plot_gradients(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=5)
    out = str(tmp_path / "exp")

    from trackmpnn_tpu.cli import train as cli_train

    cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "1",
        "--num-hidden-feats", "16", "--plot-gradients",
    ])
    imgs = glob.glob(os.path.join(out, "gradients", "*.jpg"))
    assert imgs, "no gradient-flow plots written"
