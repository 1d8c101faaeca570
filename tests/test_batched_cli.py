"""--batch-windows / --mesh training through the CLI on the virtual mesh."""

import os

import jax
import pytest

from test_datasets import write_kitti_tree


@pytest.mark.parametrize("extra", [
    ["--batch-windows", "4"],
    ["--batch-windows", "4", "--mesh", "data=4"],
    ["--batch-windows", "4", "--mesh", "data=2,edge=2"],
])
def test_train_batched(tmp_path, extra):
    assert len(jax.devices()) >= 4
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=6)
    out = str(tmp_path / ("exp_" + "_".join(extra).replace("=", "").replace(",", "")))

    from trackmpnn_tpu.cli import train as cli_train

    history = cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out, "--category", "Car", "--detections", "rrc",
        "--feats", "2d", "--cur-win-size", "4", "--epochs", "1",
        "--num-hidden-feats", "16", *extra,
    ])
    assert len(history["loss"]) == 1
    assert os.path.exists(os.path.join(out, "track-mpnn_best.npz"))
