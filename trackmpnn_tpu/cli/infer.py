"""Inference driver: test-split tracking + result files
(ref /root/reference/infer.py).  Inherits model-shape flags from the
snapshot's training config.json.

Run: python -m trackmpnn_tpu.cli.infer --snapshot <ckpt> --dataset-root-path ...
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from trackmpnn_tpu.utils.config import parse_infer_args


def main(argv: Optional[List[str]] = None):
    args = parse_infer_args(argv)

    import jax

    from trackmpnn_tpu.cli.train import attach_vis, make_dataset, make_embed_trainer, load_vis_net
    from trackmpnn_tpu.decode import Tracker, TrackerConfig
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train import checkpoint

    infer_ds = make_dataset(args, "test")
    embed = make_embed_trainer(args)
    load_vis_net(embed, args.snapshot)
    cfg = mpnn.ModelConfig(
        features=args.feats, ncategories=len(infer_ds.class_dict),
        nhidden=args.num_hidden_feats, nattheads=args.num_att_heads,
        msg_type=args.msg_type,
    )
    params = mpnn.init_params(jax.random.key(args.seed), cfg)
    stats = mpnn.init_batch_stats(cfg)
    state = {"params": params, "batch_stats": stats}
    loaded = checkpoint.load(args.snapshot, {
        "params": params, "batch_stats": stats, "opt_state": None,
        "epoch": 0, "best_mota": 0.0,
    })
    params, stats = loaded["params"], loaded["batch_stats"]

    tracker = Tracker(params, stats, cfg, TrackerConfig(
        cur_win_size=args.cur_win_size, ret_win_size=args.ret_win_size,
        hungarian=args.hungarian, tp_classifier=args.tp_classifier,
        prune_threshold=getattr(args, "prune_threshold", None),
    ))

    for b_idx in range(len(infer_ds)):
        feats, bbox_pred, _, vis_meta = infer_ds[b_idx]
        if feats.shape[0] == 0:
            print("No detections available for sequence...")
            continue
        feats, _ = attach_vis(feats, vis_meta, embed,
                              bbox_pred[:, 1].astype(np.int32), train=False)
        y_seq = bbox_pred[:, :2].astype(np.int64)
        y_out = tracker.run(
            feats, y_seq,
            progress=lambda t, te: print(
                f"Sequence {b_idx + 1}, generated tracks upto t = {t}/{te}..."
            ),
        )
        if args.dataset == "kitti":
            from trackmpnn_tpu.data.kitti import store_kitti_results

            store_kitti_results(bbox_pred[:, 2:], y_out, infer_ds.class_dict,
                                os.path.join(args.output_dir, "%.4d.txt" % b_idx))
        else:
            from trackmpnn_tpu.data.bdd100k import store_bdd100k_results

            store_bdd100k_results(bbox_pred[:, 2:], y_out, infer_ds.class_dict,
                                  os.path.join(args.output_dir, "%.4d.json" % b_idx))
        print(f"Done with sequence {b_idx + 1} out of {len(infer_ds)}...")


if __name__ == "__main__":
    main()
