"""Training driver: epoch loop + validation + checkpointing.

The reference's train.py:316-397 loop, restructured TPU-first: every chunk
becomes a teacher-forced WindowSchedule (host), bucketed to a bounded set
of padded shapes, and executed as one jit'd scan (device).  Validation runs
the rolling-window Tracker and selects on MOTA like the reference
(train.py:300-307), but checkpoints carry FULL train state (optimizer,
epoch, best metric), fixing the reference's weights-only resume.

Run: python -m trackmpnn_tpu.cli.train --dataset kitti ...
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from trackmpnn_tpu.utils.config import parse_train_args


def _bucket(n: int, base: int = 256) -> int:
    c = base
    while c < n:
        c *= 2
    return c


def _t_bucket(t: int, base: int = 4) -> int:
    return ((t + base - 1) // base) * base


def default_input_hw(args):
    if getattr(args, "embed_input_h", 0) and getattr(args, "embed_input_w", 0):
        return (args.embed_input_h, args.embed_input_w)
    return (384, 1280) if args.dataset == "kitti" else (720, 1280)


def make_dataset(args, split: str):
    kw = dict(
        random_transforms=(split == "train" and getattr(args, "random_transforms", False)),
        seed=args.seed,
        defer_vis=True,  # the trainer owns the embedding net
        input_hw=default_input_hw(args),
        down_ratio=1 if args.embed_arch == "espv2" else 4,
    )
    if args.dataset == "kitti":
        from trackmpnn_tpu.data.kitti import KittiMOTDataset

        return KittiMOTDataset(
            args.dataset_root_path, split, args.category, args.detections,
            args.feats, args.cur_win_size, args.ret_win_size, **kw,
        )
    from trackmpnn_tpu.data.bdd100k import BDD100kMOTDataset

    return BDD100kMOTDataset(
        args.dataset_root_path, split, args.category, args.detections,
        args.feats, args.cur_win_size, args.ret_win_size, **kw,
    )


def make_embed_trainer(args):
    if "vis" not in args.feats:
        return None
    from trackmpnn_tpu.train.embed import EmbedTrainer

    return EmbedTrainer(arch=args.embed_arch, input_hw=default_input_hw(args),
                        seed=args.seed, train_bn=getattr(args, "train_bn", False),
                        conv_dtype="bfloat16" if getattr(args, "embed_bf16",
                                                         False) else None)


def load_vis_net(embed, snapshot_path: str, require: bool = True):
    """Restore the embedding net saved next to a tracker snapshot.

    The vis-net checkpoint is resolved by the reference's naming
    convention (track-mpnn_X -> vis-net_X, ref infer.py:15-16).  Every
    driver that attaches vis features to a loaded tracker MUST call this;
    a freshly initialized backbone silently produces garbage appearance
    features."""
    import os as _os

    from trackmpnn_tpu.train import checkpoint as _ckpt

    if embed is None:
        return
    vis_path = _os.path.join(
        _os.path.dirname(snapshot_path),
        _os.path.basename(snapshot_path).replace("track-mpnn", "vis-net"),
    )
    if not _os.path.exists(vis_path):
        if require:
            raise FileNotFoundError(
                f"feats include 'vis' but no embedding checkpoint at "
                f"{vis_path} (saved alongside the tracker snapshot)")
        return
    vstate = _ckpt.load(vis_path, {"params": embed.params,
                                   "opt_state": embed.opt_state})
    embed.params = vstate["params"]
    embed.opt_state = vstate["opt_state"]


def attach_vis(features, vis_meta, embed, track_ids, train: bool):
    """Compute vis features for a chunk and append the normalized block.
    Returns (features, embed_loss)."""
    from trackmpnn_tpu.train.embed import normalized_vis_features

    if embed is None or vis_meta is None or not isinstance(vis_meta, dict):
        return features, 0.0
    if train:
        raw, loss = embed.train_chunk(vis_meta, track_ids)
    else:
        raw, loss = embed.infer_chunk(vis_meta), 0.0
    if raw.shape[0] != features.shape[0]:
        raise RuntimeError(
            f"vis feature rows {raw.shape[0]} != detection rows {features.shape[0]}"
        )
    return np.concatenate([features, normalized_vis_features(raw)], axis=1), loss


def _parse_mesh(spec):
    """'data=4,edge=2' -> {'data': 4, 'edge': 2}; None passes through."""
    if not spec:
        return None
    out = {}
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def f1_from_counts(tp, fp, fn) -> float:
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


def run_validation(args, cfg, params, stats, val_ds, log, embed=None):
    import jax.numpy as jnp

    from trackmpnn_tpu.decode import TrackerConfig
    from trackmpnn_tpu.decode.batch_tracker import BatchedTracker
    from trackmpnn_tpu.eval.detection import compute_map
    from trackmpnn_tpu.eval.mot import accumulate_sequence, summarize
    from trackmpnn_tpu.losses import f1_counts, make_targets

    # load all sequences, then track them in lockstep (one vmapped device
    # call per global step) - the reference can only do one at a time
    seqs, metas = [], []
    for b_idx in range(len(val_ds)):
        feats, bbox_pred, bbox_gt, vis_meta = val_ds[b_idx]
        if feats.shape[0] == 0 or bbox_gt.shape[0] == 0:
            log("No detections available for sequence...")
            continue
        feats, _ = attach_vis(feats, vis_meta, embed,
                              bbox_pred[:, 1].astype(np.int32), train=False)
        seqs.append((feats, bbox_pred[:, :2].astype(np.int64)))
        metas.append((bbox_pred, bbox_gt))

    f1s = []

    def on_step(_seq_idx, g, scores2):
        # per-step F1 vs teacher targets, as the reference logs
        # (train.py:244-253)
        n = g.n
        lbl = jnp.asarray(g.label.astype(np.int32))
        is_det = jnp.asarray(g.ts != -1)
        past = jnp.asarray(np.where(g.past >= 0, g.past, np.arange(n)).astype(np.int32))
        fut = jnp.asarray(np.where(g.fut >= 0, g.fut, np.arange(n)).astype(np.int32))
        live = jnp.ones(n, bool)
        tgt = make_targets(lbl, is_det, past, fut, live)
        tp, fp, fn = f1_counts(jnp.asarray(scores2[:, 1]), tgt, is_det, live,
                               args.tp_classifier)
        f1s.append(f1_from_counts(int(tp), int(fp), int(fn)))

    tracker = BatchedTracker(params, stats, cfg, TrackerConfig(
        cur_win_size=args.cur_win_size, ret_win_size=args.ret_win_size,
        hungarian=args.hungarian, tp_classifier=args.tp_classifier,
    ))
    y_outs = tracker.run(seqs, on_step=on_step)

    accs = []
    pred_dict, gt_dict = {}, {}
    for b_idx, ((bbox_pred, bbox_gt), y_out) in enumerate(zip(metas, y_outs)):
        y_gt = bbox_gt[:, :2].astype(np.int64)
        acc = accumulate_sequence(bbox_pred[:, 2:], bbox_gt[:, 2:], y_out, y_gt)
        if acc is not None:
            accs.append(acc)
        sel = y_out[:, 1] >= 0
        pred_dict[str(b_idx)] = (y_out[sel], bbox_pred[sel, 2:])
        gt_dict[str(b_idx)] = (y_gt, bbox_gt[:, 2:])
        log(f"Done with sequence {b_idx + 1} of {len(metas)}...")

    val_f1 = float(np.mean(f1s)) if f1s else 0.0
    # per-sequence MOTA logging, as the reference does (train.py:289-290)
    for i, acc in enumerate(accs):
        log(f"Validation MOTA for sequence {i} = "
            f"{100.0 * summarize([acc])['mota']:.2f}%")
    val_mota = 100.0 * summarize(accs)["mota"] if accs else -1.0
    val_map = 100.0 * compute_map(pred_dict, gt_dict) if gt_dict else 0.0
    return val_f1, val_mota, val_map


def main(argv: Optional[List[str]] = None):
    args = parse_train_args(argv)

    import jax
    import jax.numpy as jnp

    from trackmpnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train import checkpoint, optim
    from trackmpnn_tpu.train.step import make_train_step, schedule_to_device

    log_f = open(os.path.join(args.output_dir, "logs.txt"), "w")

    def log(msg):
        print(msg)
        log_f.write(str(msg) + "\n")
        log_f.flush()

    train_ds = make_dataset(args, "train")
    val_ds = make_dataset(args, "val")
    embed = make_embed_trainer(args)

    cfg = mpnn.ModelConfig(
        features=args.feats, ncategories=len(train_ds.class_dict),
        nhidden=args.num_hidden_feats, nattheads=args.num_att_heads,
        msg_type=args.msg_type,
    )
    params = mpnn.init_params(jax.random.key(args.seed), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(args.learning_rate, args.weight_decay)
    opt_state = tx.init(params)
    start_epoch = 1
    best_mota = -float("inf")
    if args.snapshot is not None:
        state = {"params": params, "batch_stats": stats, "opt_state": opt_state,
                 "epoch": 0, "best_mota": 0.0}
        state = checkpoint.load(args.snapshot, state)
        params, stats = state["params"], state["batch_stats"]
        opt_state = state["opt_state"]
        start_epoch = int(state["epoch"]) + 1
        best_mota = float(state["best_mota"])
        # vis branch: restore the embedding net saved next to the snapshot
        # (otherwise the resumed run silently trains on a fresh random
        # backbone, discarding all embedding progress)
        load_vis_net(embed, args.snapshot)
        log(f"resumed from {args.snapshot} at epoch {start_epoch}")

    # batched / sharded training path (net-new capability; reference is
    # strictly batch-1 single-device)
    mesh_axes = _parse_mesh(args.mesh)
    batch_windows = max(args.batch_windows, 1)
    # TM_FORCE_BLOCK=1 routes --batch-windows 1 through the batched block
    # path too (A/B: isolates single-window-path vs update-cadence effects,
    # round-5 BDD bw=1 bisect)
    use_batched = (batch_windows > 1 or mesh_axes is not None
                   or os.environ.get("TM_FORCE_BLOCK", "") == "1")
    data_only_mesh = mesh_axes is not None and set(mesh_axes) == {"data"}
    use_packed = use_batched and mesh_axes is None
    # TM_PACKED=1 forces the slower packed block-diagonal path (A/B debugging)
    use_block = ((use_packed or data_only_mesh)
                 and os.environ.get("TM_PACKED", "0") != "1")
    if use_block:
        # block-structured fast path (single-device, or shard_map'd over a
        # data-only mesh): the graph is a union of complete-bipartite
        # rectangles, so message passing, the GAT softmax and the losses
        # run scatter-free in dual layout (train/block.py); under a mesh
        # each device runs the identical fast path on its own windows
        # (parallel/block_parallel.py)
        from trackmpnn_tpu.train.block import (block_dims, build_block_batch,
                                               make_block_train_step)

        dt_lp = jnp.bfloat16 if getattr(args, "bf16", True) else None
        # fused Pallas round: TPU-compiled kernel; interpret mode off-TPU is
        # slow, so the CPU backend keeps the XLA round unless forced
        fused = (getattr(args, "fused", True)
                 and (jax.default_backend() == "tpu"
                      or os.environ.get("TM_FUSED", "") == "1"))
        # deferred loss (post-scan, vmapped over steps): auto = follow the
        # fused round, i.e. on for the TPU production path
        defer_loss = getattr(args, "defer_loss", None)
        if defer_loss is None:
            defer_loss = fused or os.environ.get("TM_DEFER_LOSS", "") == "1"
        where = f"{batch_windows} windows/step"
        if data_only_mesh:
            from trackmpnn_tpu.parallel import make_mesh
            from trackmpnn_tpu.parallel.block_parallel import \
                make_sharded_block_step

            if batch_windows % mesh_axes["data"] != 0:
                raise ValueError(
                    "--batch-windows must divide by the data axis size")
            mesh = make_mesh(mesh_axes,
                             jax.devices()[:mesh_axes["data"]])
            step = make_sharded_block_step(mesh, cfg, tx,
                                           args.tp_classifier,
                                           compute_dtype=dt_lp, fused=fused,
                                           defer_loss=defer_loss)
            where += f" over mesh {mesh_axes}"
        else:
            step = make_block_train_step(cfg, tx, args.tp_classifier,
                                         compute_dtype=dt_lp, fused=fused,
                                         defer_loss=defer_loss)
        block_dims_max = [0, 0, 0]  # growing buckets bound recompiles
        log(f"block-structured batched training: {where}"
            + (" (bf16)" if dt_lp else "") + (" (fused round)" if fused else "")
            + (" (deferred loss)" if defer_loss else ""))
    elif use_packed:
        # packed block-diagonal graphs (row-layout general path, TM_PACKED=1)
        from trackmpnn_tpu.train.packed import make_packed_train_step, pack_schedules

        step = make_packed_train_step(cfg, tx, args.tp_classifier)
        log(f"packed batched training: {batch_windows} windows/step")
    elif use_batched:
        from trackmpnn_tpu.parallel import batch_schedules, make_mesh, make_sharded_train_step

        if "data" not in mesh_axes:
            raise ValueError("--mesh must include a 'data' axis")
        if batch_windows % mesh_axes["data"] != 0:
            raise ValueError("--batch-windows must divide by the data axis size")
        n_mesh = int(np.prod(list(mesh_axes.values())))
        mesh = make_mesh(mesh_axes, jax.devices()[:n_mesh])
        edge_axis = "edge" if mesh_axes.get("edge", 1) > 1 else None
        step = make_sharded_train_step(mesh, cfg, tx, args.tp_classifier,
                                       edge_axis=edge_axis)
        log(f"batched training: {batch_windows} windows/step over mesh {mesh_axes}")
    else:
        step = make_train_step(cfg, tx, args.tp_classifier,
                               return_grads=args.plot_gradients)
    lr_of = optim.step_lr(args.learning_rate)
    rng = np.random.default_rng(args.seed)
    # GAT attention dropout needs a PRNG key at train time; fold per step
    gat_rng = jax.random.key(args.seed) if cfg.nattheads > 0 else None
    step_counter = [0]

    def step_kwargs():
        if gat_rng is None:
            return {}
        step_counter[0] += 1
        return {"rng": jax.random.fold_in(gat_rng, step_counter[0])}

    history = {"loss_c": [], "loss_f": [], "loss": [], "train_f1": [],
               "val_f1": [], "val_mota": [], "val_map": []}

    for epoch in range(start_epoch, args.epochs + 1):
        optim.set_lr(opt_state, lr_of(epoch))
        order = rng.permutation(len(train_ds))
        ep_losses, ep_c, ep_f, ep_d, ep_f1 = [], [], [], [], []
        t0 = time.time()

        def build_chunk(i):
            feats, bbox_pred, _, vis_meta = train_ds[int(i)]
            if feats.shape[0] == 0:
                return None
            if embed is not None:
                # vis path: embed step mutates device state; stay serial
                return ("raw", feats, bbox_pred, vis_meta)
            ws = _build_sched(feats, bbox_pred)
            return ("sched", ws, feats, bbox_pred) if ws is not None else None

        def _build_sched(feats, bbox_pred, cap=None, t_cap=None):
            y = bbox_pred[:, :2].astype(np.int64)
            if cap is None:
                ws = build_window_schedule(feats, y, cap=args.slot_cap or None,
                                           bucket=256)
                if ws is None:
                    return None
                cap = args.slot_cap or _bucket(ws.n_rows)
                t_cap = _t_bucket(ws.n_steps)
            return build_window_schedule(feats, y, cap=cap, t_cap=t_cap)

        def record(loss, aux):
            ep_losses.append(float(loss))
            ep_c.append(float(np.asarray(aux["loss_ce"]).mean()))
            ep_f.append(float(np.asarray(aux["loss_f"]).mean()))
            tp = int(np.sum(np.asarray(aux["tp"])))
            fp = int(np.sum(np.asarray(aux["fp"])))
            fn = int(np.sum(np.asarray(aux["fn"])))
            ep_f1.append(f1_from_counts(tp, fp, fn))

        def flush_batch(buffer):
            nonlocal params, stats, opt_state
            cap = max(len(w.is_det) for w, _, _ in buffer)
            t_cap = max(len(w.n_before) for w, _, _ in buffer)
            scheds = []
            for ws, feats_b, bbox_b in buffer:
                if len(ws.is_det) != cap or len(ws.n_before) != t_cap:
                    ws = _build_sched(feats_b, bbox_b, cap=cap, t_cap=t_cap)
                scheds.append(ws)
            if use_block:
                dims = block_dims(scheds)
                for i in range(3):
                    block_dims_max[i] = max(block_dims_max[i], dims[i])
                sbatch = build_block_batch(scheds, t_cap, *block_dims_max)
            elif use_packed:
                sbatch = pack_schedules(scheds, cap, t_cap)
            else:
                sbatch = batch_schedules(scheds, cap, t_cap)
            params, stats, opt_state, loss, aux = step(
                params, stats, opt_state, sbatch, **step_kwargs())
            record(loss, aux)

        from trackmpnn_tpu.data.loader import PrefetchLoader

        loader = PrefetchLoader(build_chunk, order, depth=4,
                                workers=1 if embed is not None else 2)
        batch_buf = []
        for it, item in enumerate(loader):
            if item is None:
                log("No detections available for sequence...")
                continue
            if item[0] == "raw":
                _, feats, bbox_pred, vis_meta = item
                feats, loss_d = attach_vis(feats, vis_meta, embed,
                                           bbox_pred[:, 1].astype(np.int32),
                                           train=True)
                ep_d.append(loss_d)
                ws = _build_sched(feats, bbox_pred)
            else:
                _, ws, feats, bbox_pred = item
            if ws is None:
                continue
            if use_batched:
                batch_buf.append((ws, feats, bbox_pred))
                if len(batch_buf) == batch_windows:
                    flush_batch(batch_buf)
                    batch_buf = []
            else:
                sb = schedule_to_device(ws)
                params, stats, opt_state, loss, aux = step(
                    params, stats, opt_state, sb, **step_kwargs())
                record(loss, aux)
                if args.plot_gradients and len(ep_losses) % 100 == 1 and "grads" in aux:
                    from trackmpnn_tpu.eval.visualize import plot_grad_flow

                    plot_grad_flow([aux["grads"]], os.path.join(
                        args.output_dir, "gradients",
                        "epoch%.3d_iter%.6d.jpg" % (epoch, it)))
            if ep_losses and it % args.log_schedule == 0:
                log(f"Epoch: {epoch} [{it + 1}/{len(order)}]\tLoss: {ep_losses[-1]:.5f}")
        if batch_buf:
            log(f"dropping {len(batch_buf)} leftover chunk(s) (< batch-windows)")

        log("------------------------")
        if embed is not None and ep_d:
            log(f"Average embedding loss for epoch = {np.mean(ep_d):.2f}")
        log(f"Average cross-entropy loss for epoch = {np.mean(ep_c):.2f}")
        log(f"Average focal loss for epoch = {np.mean(ep_f):.2f}")
        log(f"Average loss for epoch = {np.mean(ep_losses):.2f}")
        log(f"Average F1 score for epoch = {np.mean(ep_f1):.4f}")
        log(f"Epoch wall time = {time.time() - t0:.1f}s")
        history["loss"].append(float(np.mean(ep_losses)))
        history["loss_c"].append(float(np.mean(ep_c)))
        history["loss_f"].append(float(np.mean(ep_f)))
        history["train_f1"].append(float(np.mean(ep_f1)))

        val_f1, val_mota, val_map = run_validation(args, cfg, params, stats,
                                                   val_ds, log, embed=embed)
        log(f"Validation F1 score = {val_f1:.4f}")
        log(f"Validation MOTA = {val_mota:.2f}%")
        log(f"Validation mAP = {val_map:.2f}%")
        history["val_f1"].append(val_f1)
        history["val_mota"].append(val_mota)
        history["val_map"].append(val_map)

        if val_mota > best_mota:
            best_mota = val_mota
            state = {"params": params, "batch_stats": stats, "opt_state": opt_state,
                     "epoch": epoch, "best_mota": best_mota}
            checkpoint.save(os.path.join(args.output_dir, "track-mpnn_%.4d.npz" % epoch), state)
            checkpoint.save(os.path.join(args.output_dir, "track-mpnn_best.npz"), state)
            if embed is not None:
                vstate = {"params": embed.params, "opt_state": embed.opt_state}
                checkpoint.save(os.path.join(args.output_dir, "vis-net_%.4d.npz" % epoch), vstate)
                checkpoint.save(os.path.join(args.output_dir, "vis-net_best.npz"), vstate)
            log(f"saved best checkpoint (MOTA {best_mota:.2f}%)")

        _save_plots(args.output_dir, history)

    log_f.close()
    return history


def _save_plots(output_dir, history):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.grid(True)
        ax.plot(history["loss_c"], "g", label="Cross-entropy loss")
        ax.plot(history["loss_f"], "b", label="Focal loss")
        ax.plot(history["loss"], "k", label="Total loss")
        ax.legend()
        fig.savefig(os.path.join(output_dir, "train_loss.jpg"))
        plt.close(fig)

        fig, ax = plt.subplots()
        ax.grid(True)
        ax.plot(history["train_f1"], "g", label="Train F1 score")
        ax.plot(history["val_f1"], "b", label="Validation F1 score")
        ax.legend()
        fig.savefig(os.path.join(output_dir, "train_val_f1.jpg"))
        plt.close(fig)

        fig, ax = plt.subplots()
        ax.grid(True)
        ax.plot(history["val_mota"], "b", label="Validation MOTA")
        ax.plot(history["val_map"], "r", label="Validation mAP")
        ax.legend()
        fig.savefig(os.path.join(output_dir, "val_mota+map.jpg"))
        plt.close(fig)
    except Exception as e:  # plotting must never kill training
        print(f"plotting skipped: {e}")


if __name__ == "__main__":
    main()
