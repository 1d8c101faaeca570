"""Attention-weight analysis driver (ref /root/reference/attention_weights.py):
runs the val split through a GAT-headed model, collects per-head attention
weights on association edges split by correct (GT-positive edge) vs
incorrect, and plots per-head histograms.

Run: python -m trackmpnn_tpu.cli.attention --snapshot <ckpt> ...
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from trackmpnn_tpu.utils.config import parse_infer_args


def main(argv: Optional[List[str]] = None):
    args = parse_infer_args(argv)

    import jax

    from trackmpnn_tpu.cli.train import make_dataset
    from trackmpnn_tpu.decode import Tracker, TrackerConfig
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train import checkpoint

    if args.num_att_heads <= 0:
        raise ValueError("attention analysis requires a model trained with "
                         "--num-att-heads > 0")

    val_ds = make_dataset(args, "val")
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
    ))

    per_head = [{"tp": [], "fp": []} for _ in range(args.num_att_heads)]

    def on_step(g, scores2):
        att = tracker.last_attention
        if att is None:
            return
        n = g.n
        edge = g.ts == -1
        label = g.label
        for branch_att in att:
            for h, w2 in enumerate(branch_att):
                cap = w2.shape[0] // 2
                for half in (w2[:cap], w2[cap:]):
                    vals = half[:n][edge]
                    labs = label[edge]
                    per_head[h]["tp"].extend(vals[labs == 1].tolist())
                    per_head[h]["fp"].extend(vals[labs == 0].tolist())

    from trackmpnn_tpu.cli.train import (attach_vis, load_vis_net,
                                         make_embed_trainer)

    embed = make_embed_trainer(args)
    load_vis_net(embed, args.snapshot)
    for b_idx in range(len(val_ds)):
        feats, bbox_pred, bbox_gt, vis_meta = val_ds[b_idx]
        if feats.shape[0] == 0:
            continue
        feats, _ = attach_vis(feats, vis_meta, embed,
                              bbox_pred[:, 1].astype(np.int32), train=False)
        tracker.run(feats, bbox_pred[:, :2].astype(np.int64), on_step=on_step)
        print(f"Done with sequence {b_idx + 1} of {len(val_ds)}...")

    np.savez(os.path.join(args.output_dir, "attention_weights.npz"),
             **{f"head{h}_{k}": np.asarray(v)
                for h, d in enumerate(per_head) for k, v in d.items()})
    _plot(args, per_head)
    return per_head


def _plot(args, per_head):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    H = len(per_head)
    fig, ax = plt.subplots(H, 2, figsize=(8, 3 * H), squeeze=False)
    for i, d in enumerate(per_head):
        for j, key in enumerate(("tp", "fp")):
            vals = np.asarray(d[key])
            if vals.size:
                ax[i][j].hist(vals, 20, color="gray", range=(0.0, 1.0),
                              edgecolor="black", linewidth=1.2,
                              weights=np.ones_like(vals) / len(vals))
            ax[i][j].grid(True)
        ax[i][0].set_ylabel(f"Normalized count for\nattention head #{i}")
    ax[-1][0].set_xlabel("Attention weights for\ncorrect associations")
    ax[-1][1].set_xlabel("Attention weights for\nincorrect associations")
    fig.savefig(os.path.join(args.output_dir, "att_dist.png"),
                bbox_inches="tight")
    plt.close(fig)


if __name__ == "__main__":
    main()
