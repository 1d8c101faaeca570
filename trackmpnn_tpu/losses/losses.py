"""Training losses, fully vectorized on device.

The reference derives targets and the per-detection cross-entropy with
Python loops over a dense adjacency pulled back to CPU every step
(/root/reference/models/loss.py:8-44, 77-115).  Here both are masked
segment reductions over the edge->endpoint index arrays, so they live
inside the jit'd scan:

  * targets (loss.py:8-44): a detection's target is its label; among the
    positive-LABEL edges incident to a detection, the latest (highest row)
    past edge and the earliest (lowest row) future edge get target 1.
  * CE (loss.py:77-115): for every detection with a positive-TARGET edge in
    its past (resp. future) incident set, cross-entropy of that set's
    logits against the chosen positive, weighted by 1/|set|; multiple
    positives resolve to the latest (past) / earliest (future).
  * focal (loss.py:47-74): gamma=0, alpha=None => mean BCE with the
    reference's log(p + 1e-10) epsilon placement.
"""

from __future__ import annotations

import jax.numpy as jnp

from trackmpnn_tpu.ops import (
    segment_argmax,
    segment_logsumexp,
    segment_sum,
)

EPS = 1e-10


def make_targets(label, is_det, past, fut, live):
    """Binary target per row (ref create_targets, loss.py:8-44)."""
    n = label.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    edge_live = live & ~is_det
    pos = edge_live & (label == 1)
    ones = jnp.ones(n, jnp.float32)
    # latest positive-label edge into each det (segment over future endpoint)
    past_sel = segment_argmax(ones, fut, n, mask=pos, tie="high")
    # earliest positive-label edge out of each det (segment over past endpoint)
    fut_sel = segment_argmax(ones, past, n, mask=pos, tie="low")
    edge_t = (idx == past_sel[jnp.clip(fut, 0, n - 1)]) | (idx == fut_sel[jnp.clip(past, 0, n - 1)])
    det_t = (label == 1) & is_det
    return jnp.where(live, jnp.where(is_det, det_t, edge_t & edge_live), False).astype(jnp.int32)


def ce_loss(logits, targets, is_det, past, fut, live):
    """Per-detection softmax CE over incident edge sets (ref CELoss)."""
    n = logits.shape[0]
    edge_live = live & ~is_det
    tpos = edge_live & (targets == 1)
    ones = jnp.ones(n, jnp.float32)
    det_live = live & is_det

    def one_side(seg, tie):
        size = segment_sum(ones, seg, n, mask=edge_live)
        sel = segment_argmax(ones, seg, n, mask=tpos, tie=tie)
        has = (sel >= 0) & det_live
        lse = segment_logsumexp(logits, seg, n, mask=edge_live)
        sel_logit = logits[jnp.clip(sel, 0, n - 1)]
        per_det = jnp.where(has, (lse - sel_logit) / jnp.maximum(size, 1.0), 0.0)
        return jnp.sum(per_det)

    # past sets: edges whose future endpoint is d (chosen positive = latest);
    # future sets: edges whose past endpoint is d (chosen positive = earliest)
    return one_side(fut, "high") + one_side(past, "low")


def bce_loss(probs, targets, mask):
    """Mean BCE with the reference's epsilon inside the log (FocalLoss g=0)."""
    pt = jnp.where(targets == 1, probs, 1.0 - probs)
    lp = jnp.log(pt + EPS)
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    return -jnp.sum(jnp.where(mask, lp, 0.0)) / cnt


def focal_loss(probs, targets, mask, gamma: float = 0.0):
    """General focal loss; gamma=0 reduces to bce_loss."""
    pt = jnp.where(targets == 1, probs, 1.0 - probs)
    lp = jnp.log(pt + EPS)
    w = (1.0 - pt) ** gamma if gamma > 0 else 1.0
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    return -jnp.sum(jnp.where(mask, w * lp, 0.0)) / cnt


def f1_counts(scores, targets, is_det, live, tp_classifier: bool):
    """Confusion counts for the per-step F1 the drivers report
    (ref train.py:77-88): predictions threshold sigmoid at 0.5; when the
    TP-classifier head is off, detections are forced positive and only
    edges are scored."""
    pred = scores >= 0.5
    if tp_classifier:
        mask = live
    else:
        mask = live & ~is_det
    t = targets == 1
    tp = jnp.sum(mask & pred & t)
    fp = jnp.sum(mask & pred & ~t)
    fn = jnp.sum(mask & ~pred & t)
    return tp, fp, fn


def step_losses(out_scores, out_logits, label, is_det, past, fut, live, tp_classifier: bool):
    """One step's (loss_ce, loss_focal, f1 counts) as in ref train.py:70-88."""
    targets = make_targets(label, is_det, past, fut, live)
    l_ce = ce_loss(out_logits, targets, is_det, past, fut, live)
    edge_mask = live & ~is_det
    node_mask = live & is_det
    if tp_classifier:
        l_f = bce_loss(out_scores, targets, node_mask) + bce_loss(out_scores, targets, edge_mask)
    else:
        l_f = bce_loss(out_scores, targets, edge_mask)
    tp, fp, fn = f1_counts(out_scores, targets, is_det, live, tp_classifier)
    return l_ce, l_f, (tp, fp, fn), targets
