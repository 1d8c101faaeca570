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
from trackmpnn_tpu.losses.losses import EPS, ce_loss, f1_counts, make_targets
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.ops import segment_sum


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


def _per_window_bce(probs, targets, mask, window, n_windows):
    """Per-window mean BCE (reference eps placement), then sum of means."""
    pt = jnp.where(targets == 1, probs, 1.0 - probs)
    lp = jnp.log(pt + EPS)
    ones = jnp.ones_like(lp)
    s = segment_sum(jnp.where(mask, lp, 0.0), window, n_windows)
    c = segment_sum(jnp.where(mask, ones, 0.0), window, n_windows)
    return -jnp.sum(s / jnp.maximum(c, 1.0))


def packed_window_forward(params, batch_stats, cfg: mpnn.ModelConfig,
                          pb: PackedBatch, tp_classifier: bool,
                          train: bool = True):
    """Scan the packed batch; returns (mean-per-window loss, aux)."""
    cap, B = pb.cap, pb.n_windows
    n = cap * B
    nb = len(cfg.branches)
    within = jnp.arange(n, dtype=jnp.int32) % cap  # slot index inside window
    h0 = jnp.zeros((n, nb * cfg.nhidden), jnp.float32)

    def step(carry, s):
        h, stats = carry
        n_b = pb.n_before[s][pb.window]
        n_a = pb.n_after[s][pb.window]
        valid = pb.step_valid[s][pb.window]
        any_valid = jnp.any(pb.step_valid[s])
        live = (within < n_a) & valid
        new = (within >= n_b) & live
        g = GraphView(is_det=pb.is_det, past=pb.past, fut=pb.fut,
                      live=live, new=new, feat=pb.feat)
        out, stats_new = mpnn.forward(params, stats, cfg, g, h, train=train)

        targets = make_targets(pb.label, pb.is_det, pb.past, pb.fut, live)
        l_ce = ce_loss(out.logits, targets, pb.is_det, pb.past, pb.fut, live)
        edge_mask = live & ~pb.is_det
        node_mask = live & pb.is_det
        if tp_classifier:
            l_f = _per_window_bce(out.scores, targets, node_mask, pb.window, B) + \
                _per_window_bce(out.scores, targets, edge_mask, pb.window, B)
        else:
            l_f = _per_window_bce(out.scores, targets, edge_mask, pb.window, B)
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
    def loss_fn(params, batch_stats, pb):
        return packed_window_forward(params, batch_stats, cfg, pb, tp_classifier)

    @jax.jit
    def step(params, batch_stats, opt_state, pb: PackedBatch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, pb)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, aux["batch_stats"], opt_state, loss, {
            k: aux[k] for k in ("loss_ce", "loss_f", "tp", "fp", "fn")
        }

    return step
