"""The synthetic KITTI tree writer drives the real dataset pipeline."""

import numpy as np

from trackmpnn_tpu.data.kitti import KittiMOTDataset
from trackmpnn_tpu.data.synthetic import write_kitti_tree


def test_write_tree_roundtrip(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, num_frames=10, num_tracks=4, seed=3)
    ds = KittiMOTDataset(root, "train", "All", "rrc", "2d",
                         cur_win_size=5, ret_win_size=2, seed=5)
    assert len(ds) > 0
    feats, bbox_pred, bbox_gt, _ = ds[0]
    assert feats.shape[0] == bbox_pred.shape[0] > 0
    # IoU assignment recovered GT track ids for most true detections
    assigned = np.sum(bbox_pred[:, 1] >= 0)
    assert assigned >= 0.5 * bbox_pred.shape[0]
    assert bbox_gt.shape[0] > 0
    # val split parses whole sequences
    dval = KittiMOTDataset(root, "val", "All", "rrc", "2d")
    _, bp, _, _ = dval[0]
    assert bp[:, 0].max() == 9
