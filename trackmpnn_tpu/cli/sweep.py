"""Rolling-window size sweep (BASELINE.md config 4): evaluate one trained
snapshot at several cur-win-size values and report MOT metrics per size.

The rolling window is the reference's sequence-length scaling mechanism
(SURVEY.md 5): larger windows keep more graph live per step (more context,
more compute).  This driver stresses exactly that axis.

Run: python -m trackmpnn_tpu.cli.sweep --snapshot <ckpt> \
         --dataset-root-path ... --win-sizes 5 10 15 20
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from trackmpnn_tpu.utils.config import (
    build_infer_parser,
    finalize_args,
    inherit_training_config,
)


def main(argv: Optional[List[str]] = None):
    p = build_infer_parser()
    p.add_argument("--win-sizes", type=int, nargs="+", default=[5, 10, 15, 20])
    args = p.parse_args(argv)
    args = inherit_training_config(args)
    args = finalize_args(args, "sweep")

    import jax

    from trackmpnn_tpu.cli.train import (attach_vis, load_vis_net,
                                         make_dataset, make_embed_trainer)
    from trackmpnn_tpu.decode import TrackerConfig
    from trackmpnn_tpu.decode.batch_tracker import BatchedTracker
    from trackmpnn_tpu.eval.mot import accumulate_sequence, summarize
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train import checkpoint
    from trackmpnn_tpu.utils.profiling import Throughput

    val_ds = make_dataset(args, "val")
    embed = make_embed_trainer(args)
    load_vis_net(embed, args.snapshot)
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

    seqs, metas = [], []
    for b_idx in range(len(val_ds)):
        feats, bbox_pred, bbox_gt, vis_meta = val_ds[b_idx]
        if feats.shape[0] == 0 or bbox_gt.shape[0] == 0:
            continue
        feats, _ = attach_vis(feats, vis_meta, embed,
                              bbox_pred[:, 1].astype(np.int32), train=False)
        seqs.append((feats, bbox_pred[:, :2].astype(np.int64)))
        metas.append((bbox_pred, bbox_gt))

    results = {}
    for win in args.win_sizes:
        tracker = BatchedTracker(params, stats, cfg, TrackerConfig(
            cur_win_size=win, ret_win_size=args.ret_win_size,
            hungarian=args.hungarian, tp_classifier=args.tp_classifier,
        ))
        meter = Throughput()
        meter.start()
        y_outs = tracker.run(seqs)
        total_dets = sum(m[0].shape[0] for m in metas)
        meter.stop(graphs=len(seqs), steps=total_dets)
        accs = []
        for (bbox_pred, bbox_gt), y_out in zip(metas, y_outs):
            acc = accumulate_sequence(bbox_pred[:, 2:], bbox_gt[:, 2:], y_out,
                                      bbox_gt[:, :2].astype(np.int64))
            if acc is not None:
                accs.append(acc)
        m = summarize(accs) if accs else {}
        results[win] = {
            "mota": round(100 * m.get("mota", -1), 2),
            "idf1": round(100 * m.get("idf1", 0), 2),
            "num_switches": m.get("num_switches", -1),
            "seqs_per_sec": round(meter.graphs_per_sec, 3),
        }
        print(f"cur-win-size={win}: {results[win]}")

    out = os.path.join(args.output_dir, "window_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    return results


if __name__ == "__main__":
    main()
