"""Packed window batching: the batch IS the graph.

vmap-batching the scanned window forward makes every GRU matmul a batched
contraction, which XLA lowers to convolutions whose operands need
layout-transposing bf16 conversion fusions over [B, cap, H] - profiled at
~40% of step time (see CLAUDE.md).  The index-form graph offers a better
way: concatenate the B windows into ONE block-diagonal graph by offsetting
each window's edge endpoints by k*cap.  Every matmul is then a plain 2D
[B*cap, H] x [H, 3H] - native MXU shape, no batch dims, no transposes -
and gathers/segment-sums just run over the longer row axis.

Loss semantics match the vmapped path: CE is a per-window sum -> the global
sum / B equals the mean of window sums; the focal/BCE *mean* is computed
per window via window-segment reductions, then averaged.  BatchNorm
statistics pool across the packed batch (true cross-window batch stats -
the sync-BN choice documented for batched training).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.losses.losses import EPS, f1_counts, targets_and_ce
from trackmpnn_tpu.models import mpnn


class PackedBatch(NamedTuple):
    """B windows packed into one [B*cap]-slot graph."""

    is_det: jnp.ndarray      # bool[B*cap]
    past: jnp.ndarray        # int32[B*cap] (globally offset)
    fut: jnp.ndarray         # int32[B*cap]
    label: jnp.ndarray       # int32[B*cap]
    feat: jnp.ndarray        # f32[B*cap, F]
    window: jnp.ndarray      # int32[B*cap] window id per slot
    n_before: jnp.ndarray    # int32[t_cap, B]
    n_after: jnp.ndarray     # int32[t_cap, B]
    step_valid: jnp.ndarray  # bool[t_cap, B]

    @property
    def n_windows(self) -> int:
        return self.n_before.shape[1]

    @property
    def cap(self) -> int:
        return self.is_det.shape[0] // self.n_windows


def pack_schedules(schedules: List, cap: int, t_cap: int) -> PackedBatch:
    B = len(schedules)
    off = lambda k: k * cap

    def cat(field, dtype=None):
        return jnp.asarray(np.concatenate([np.asarray(getattr(w, field), dtype)
                                           for w in schedules]))

    past = np.concatenate([np.asarray(w.past, np.int32) + off(k)
                           for k, w in enumerate(schedules)])
    fut = np.concatenate([np.asarray(w.fut, np.int32) + off(k)
                          for k, w in enumerate(schedules)])
    window = np.concatenate([np.full(cap, k, np.int32) for k in range(B)])
    return PackedBatch(
        is_det=cat("is_det"),
        past=jnp.asarray(past), fut=jnp.asarray(fut),
        label=cat("label", np.int32), feat=cat("feat", np.float32),
        window=jnp.asarray(window),
        n_before=jnp.asarray(np.stack([w.n_before for w in schedules], 1)),
        n_after=jnp.asarray(np.stack([w.n_after for w in schedules], 1)),
        step_valid=jnp.asarray(np.stack([w.step_valid for w in schedules], 1)),
    )


def _per_window_bce(probs, targets, mask, n_windows):
    """Per-window mean BCE (reference eps placement), then sum of means.
    Windows are contiguous slot blocks, so the per-window reduction is a
    reshape-sum - no scatter."""
    pt = jnp.where(targets == 1, probs, 1.0 - probs)
    lp = jnp.log(pt + EPS)
    s = jnp.sum(jnp.where(mask, lp, 0.0).reshape(n_windows, -1), axis=1)
    c = jnp.sum(mask.reshape(n_windows, -1), axis=1)
    return -jnp.sum(s / jnp.maximum(c, 1.0))


def _forward_fused_round(params, batch_stats, cfg, pb: PackedBatch, live, new,
                         h, train):
    """mpnn.forward semantics with the message-passing round executed by the
    fused Pallas kernels (ops/pallas_round.py; 'diff', no GAT).  Input
    injection, BatchNorm, and output heads stay XLA."""
    from trackmpnn_tpu.models import nn
    from trackmpnn_tpu.ops import pallas_round as PR

    cap, B = pb.cap, pb.n_windows
    n = cap * B
    H = cfg.nhidden
    nb = len(cfg.branches)
    new_det = new & pb.is_det
    has_new = jnp.any(new)
    within = jnp.arange(n, dtype=jnp.int32) % cap
    edge_live = live & ~pb.is_det
    det_live = live & pb.is_det
    idxw = jnp.stack([
        (pb.past - (jnp.arange(n, dtype=jnp.int32) - within)),  # window-local
        (pb.fut - (jnp.arange(n, dtype=jnp.int32) - within)),
        edge_live.astype(jnp.int32), det_live.astype(jnp.int32),
    ], axis=1).reshape(B, cap, 4)

    outs, stats_out = [], []
    off = 0
    for bi, (_, width) in enumerate(cfg.branches):
        bp = params["branches"][bi]
        bs = batch_stats["branches"][bi]["bn"]
        x = pb.feat[:, off: off + width]
        off += width
        xt, bn_stats = nn.input_transform(bp["input"], bs, x, new, train=train)
        bn_stats = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_new, a, b), bn_stats, bs)
        stats_out.append({"bn": bn_stats})
        h_b = h[:, bi * H:(bi + 1) * H]
        h_b = jnp.where(new_det[:, None], xt, jnp.where(new[:, None], 0.0, h_b))
        h_b = jnp.where(live[:, None], h_b, 0.0)
        tile = 512
        while cap % tile != 0:
            tile //= 2
        out_b = PR.fused_round(h_b.reshape(B, cap, H), idxw,
                               bp["edge_gru"], bp["node_gru"], None, tile)
        outs.append(out_b.reshape(n, H))

    h_out = jnp.concatenate(outs, axis=-1)
    y_node = nn.linear(params["out_node"], h_out)[:, 0]
    y_edge = nn.linear(params["out_edge"], h_out)[:, 0]
    logits = jnp.where(pb.is_det, y_node, y_edge)
    logits = jnp.where(live, logits, 0.0)
    out = mpnn.ModelOutput(
        scores=jnp.where(live, jax.nn.sigmoid(logits), 0.0),
        logits=logits, hidden=h_out, attention=None,
    )
    return out, {"branches": stats_out}


def packed_window_forward(params, batch_stats, cfg: mpnn.ModelConfig,
                          pb: PackedBatch, tp_classifier: bool,
                          train: bool = True, fused_round: bool = False,
                          rng=None):
    """Scan the packed batch; returns (mean-per-window loss, aux).

    fused_round=True routes the message-passing round through the Pallas
    kernel pipeline (requires msg 'diff', no GAT; see ops/pallas_round.py).
    rng: PRNG key for GAT attention dropout (required to train with GAT).
    """
    cap, B = pb.cap, pb.n_windows
    n = cap * B
    nb = len(cfg.branches)
    within = jnp.arange(n, dtype=jnp.int32) % cap  # slot index inside window
    h0 = jnp.zeros((n, nb * cfg.nhidden), jnp.float32)
    if fused_round and (cfg.msg_type != "diff" or cfg.nattheads > 0):
        raise ValueError("fused round supports msg 'diff' without GAT heads")
    if train and cfg.nattheads > 0 and rng is None:
        raise ValueError("training with GAT heads needs an rng key for "
                         "attention dropout (pass rng=...)")

    def step(carry, s):
        h, stats = carry
        n_b = pb.n_before[s][pb.window]
        n_a = pb.n_after[s][pb.window]
        valid = pb.step_valid[s][pb.window]
        any_valid = jnp.any(pb.step_valid[s])
        live = (within < n_a) & valid
        new = (within >= n_b) & live
        if fused_round:
            out, stats_new = _forward_fused_round(
                params, stats, cfg, pb, live, new, h, train)
        else:
            g = GraphView(is_det=pb.is_det, past=pb.past, fut=pb.fut,
                          live=live, new=new, feat=pb.feat)
            rng_s = jax.random.fold_in(rng, s) if rng is not None else None
            out, stats_new = mpnn.forward(params, stats, cfg, g, h,
                                          train=train, rng=rng_s)

        targets, l_ce = targets_and_ce(out.logits, pb.label, pb.is_det,
                                       pb.past, pb.fut, live)
        edge_mask = live & ~pb.is_det
        node_mask = live & pb.is_det
        if tp_classifier:
            l_f = _per_window_bce(out.scores, targets, node_mask, B) + \
                _per_window_bce(out.scores, targets, edge_mask, B)
        else:
            l_f = _per_window_bce(out.scores, targets, edge_mask, B)
        tp, fp, fn = f1_counts(out.scores, targets, pb.is_det, live, tp_classifier)

        # windows whose schedule already ended keep their hidden state
        h_next = jnp.where(valid[:, None], out.hidden, h)
        stats_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(any_valid, a, b), stats_new, stats)
        zero = jnp.float32(0.0)
        return (h_next, stats_next), (
            jnp.where(any_valid, l_ce, zero), jnp.where(any_valid, l_f, zero),
            tp, fp, fn,
        )

    (h_fin, stats_fin), (l_ce, l_f, tp, fp, fn) = jax.lax.scan(
        step, (h0, batch_stats), jnp.arange(pb.n_before.shape[0]))
    total = (jnp.sum(l_ce) + jnp.sum(l_f)) / B
    aux = {
        "loss_ce": jnp.sum(l_ce) / B, "loss_f": jnp.sum(l_f) / B,
        "tp": jnp.sum(tp), "fp": jnp.sum(fp), "fn": jnp.sum(fn),
        "batch_stats": stats_fin, "hidden": h_fin,
    }
    return total, aux


def make_packed_train_step(cfg: mpnn.ModelConfig, tx, tp_classifier: bool):
    def loss_fn(params, batch_stats, pb, rng):
        return packed_window_forward(params, batch_stats, cfg, pb,
                                     tp_classifier, rng=rng)

    @jax.jit
    def step(params, batch_stats, opt_state, pb: PackedBatch, rng=None):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, pb, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, aux["batch_stats"], opt_state, loss, {
            k: aux[k] for k in ("loss_ce", "loss_f", "tp", "fp", "fn")
        }

    return step
