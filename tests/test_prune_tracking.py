"""Optional pruning path through the tracker, and window-size override."""

import jax
import numpy as np

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.decode import Tracker, TrackerConfig
from trackmpnn_tpu.models import mpnn


def test_tracker_with_pruning_runs():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    feats, bp, _ = make_sequence(num_tracks=4, num_frames=8, seed=2)
    y = bp[:, :2].astype(np.int64)
    t1 = Tracker(params, stats, cfg, TrackerConfig(bucket=128))
    t2 = Tracker(params, stats, cfg, TrackerConfig(bucket=128, prune_threshold=0.4))
    out1 = t1.run(feats, y)
    out2 = t2.run(feats, y)
    assert out1.shape == out2.shape
    # with a fresh (head-biased) model all edges score ~sigmoid(-4.595)<0.4,
    # so pruning must have removed edges but kept the pipeline consistent
    assert np.all(out2[:, 0] == y[:, 0])


def test_infer_cur_win_override(tmp_path):
    import json
    import os

    from trackmpnn_tpu.utils.config import parse_infer_args

    snapdir = tmp_path / "exp"
    snapdir.mkdir()
    with open(snapdir / "config.json", "w") as f:
        json.dump({"dataset": "kitti", "category": "Car", "detections": "rrc",
                   "feats": "2d", "embed_arch": "espv2", "cur_win_size": 5,
                   "ret_win_size": 0, "no_tp_classifier": False,
                   "num_hidden_feats": 16, "num_att_heads": 0,
                   "msg_type": "diff"}, f)
    snap = str(snapdir / "track-mpnn_best.npz")
    open(snap, "wb").close()
    args = parse_infer_args(["--snapshot", snap,
                             "--output-dir", str(tmp_path / "out"),
                             "--override-cur-win-size", "20"])
    assert args.cur_win_size == 20 and args.feats == "2d"
