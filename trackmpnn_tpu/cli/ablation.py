"""Ablation / evaluation driver: full MOT metric dump on the val split
(ref /root/reference/ablation.py:152-187).

Run: python -m trackmpnn_tpu.cli.ablation --snapshot <ckpt> ...
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from trackmpnn_tpu.utils.config import parse_infer_args


def main(argv: Optional[List[str]] = None):
    args = parse_infer_args(argv)

    import jax

    from trackmpnn_tpu.cli.train import attach_vis, make_dataset, make_embed_trainer
    from trackmpnn_tpu.decode import Tracker, TrackerConfig
    from trackmpnn_tpu.eval.mot import accumulate_sequence, summarize
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train import checkpoint

    val_ds = make_dataset(args, "val")
    embed = make_embed_trainer(args)
    if embed is not None:
        import os

        vis_path = os.path.join(
            os.path.dirname(args.snapshot),
            os.path.basename(args.snapshot).replace("track-mpnn", "vis-net"),
        )
        vstate = checkpoint.load(vis_path, {"params": embed.params,
                                            "opt_state": embed.opt_state})
        embed.params = vstate["params"]
    cfg = mpnn.ModelConfig(
        features=args.feats, ncategories=len(val_ds.class_dict),
        nhidden=args.num_hidden_feats, nattheads=args.num_att_heads,
        msg_type=args.msg_type,
    )
    params = mpnn.init_params(jax.random.key(args.seed), cfg)
    stats = mpnn.init_batch_stats(cfg)
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

    accs = []
    for b_idx in range(len(val_ds)):
        feats, bbox_pred, bbox_gt, vis_meta = val_ds[b_idx]
        if feats.shape[0] == 0 or bbox_gt.shape[0] == 0:
            continue
        feats, _ = attach_vis(feats, vis_meta, embed,
                              bbox_pred[:, 1].astype(np.int32), train=False)
        y_out = tracker.run(feats, bbox_pred[:, :2].astype(np.int64))
        acc = accumulate_sequence(bbox_pred[:, 2:], bbox_gt[:, 2:],
                                  y_out, bbox_gt[:, :2].astype(np.int64))
        if acc is not None:
            accs.append(acc)
        print(f"Done with sequence {b_idx + 1} of {len(val_ds)}...")

    m = summarize(accs)
    print("\n================ MOT metrics (OVERALL) ================")
    for k in ["idf1", "idp", "idr", "recall", "precision", "num_unique_objects",
              "mostly_tracked", "partially_tracked", "mostly_lost",
              "num_false_positives", "num_misses", "num_switches",
              "num_fragmentations", "mota", "motp"]:
        print(f"{k:>24}: {m[k]:.4f}" if isinstance(m[k], float) else f"{k:>24}: {m[k]}")
    return m


if __name__ == "__main__":
    main()
