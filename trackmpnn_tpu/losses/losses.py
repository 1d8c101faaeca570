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

import jax
import jax.numpy as jnp

from trackmpnn_tpu.ops import (
    segment_argmax,
    segment_logsumexp,
    segment_max,
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


def targets_and_ce(logits, label, is_det, past, fut, live):
    """make_targets + ce_loss fused with batched reductions.

    Semantically identical to the pair above (tests pin both), but the
    per-side reductions run on doubled rows (segment domains [fut; past+n])
    so the whole step costs 3 scatters + 2 lane-packed gathers instead of
    ~14 serialized ops - arbitrary-index scatter AND gather both serialize
    per row on TPU and dominate the real training step (see CLAUDE.md).
    The tie-break directions differ per side (past: latest; future:
    earliest), handled by negating row indices on the future half.
    """
    n = logits.shape[0]
    n2 = 2 * n
    idx = jnp.arange(n, dtype=jnp.int32)
    edge_live = live & ~is_det
    det_live = live & is_det
    # doubled rows: first half = past-side sets (bucket = fut, d in [0,n));
    # second half = future-side sets (bucket = past + n, in [n,2n))
    seg2 = jnp.concatenate([fut, past + n])
    mask2 = jnp.concatenate([edge_live, edge_live])
    # signed index: +idx on the past half (max -> latest), -idx on the future
    # half (max of -idx -> earliest)
    sidx = jnp.concatenate([idx, -idx]).astype(jnp.float32)

    clip2 = jnp.clip(seg2, 0, n2 - 1)
    logits2 = jnp.concatenate([logits, logits])

    # TPU scatter AND gather by arbitrary index serialize per row
    # (CLAUDE.md profile: ~0.6ms per 65k-row op), so this function is
    # organized around a minimal count of them: 3 scatters + 2 lane-packed
    # row gathers.  The logsumexp shift uses a GLOBAL stop-grad max (a fast
    # full reduction) instead of per-bucket maxes, saving a scatter and a
    # gather at identical math (shift invariance).

    # ---- scatter #1: label-positive selections (for targets)
    pos = label == 1
    pos2 = mask2 & jnp.concatenate([pos, pos])
    m1 = segment_max(jnp.where(pos2, sidx, -1e30), seg2, n2, mask=mask2)
    win1 = (sidx == m1[clip2]) & pos2                       # gather #1
    edge_t = (win1[:n] | win1[n:]) & edge_live
    targets = jnp.where(live, jnp.where(is_det, pos & is_det, edge_t), False)
    targets = targets.astype(jnp.int32)

    # ---- scatters #2 + #3: target selection max; [count, exp] sums
    tpos2 = mask2 & jnp.concatenate([targets == 1, targets == 1])
    sel_m = segment_max(jnp.where(tpos2, sidx, -1e30), seg2, n2, mask=mask2)
    gmax = jax.lax.stop_gradient(
        jnp.max(jnp.where(mask2, logits2, -jnp.inf), initial=0.0))
    shifted = jnp.exp(logits2 - gmax)
    sums = segment_sum(jnp.stack([jnp.ones_like(logits2), shifted], 1),
                       seg2, n2, mask=mask2)
    dl2 = jnp.concatenate([det_live, det_live])
    bucket = jnp.stack([sel_m, sums[:, 0], sums[:, 1],
                        dl2.astype(jnp.float32)], axis=1)
    rowb = bucket[clip2]                                    # gather #2 (packed)
    row_sel, size, expsum, row_dl = rowb[:, 0], rowb[:, 1], rowb[:, 2], rowb[:, 3]
    lse = gmax + jnp.log(jnp.maximum(expsum, 1e-30))

    # per-ROW cross entropy: exactly one winner row per nonempty positive
    # set, so sum_d (lse_d - logit_sel)/|set|  ==  sum_rows win2*(...)
    win2 = (jnp.where(tpos2, sidx, -1e30) == row_sel) & tpos2
    counted = win2 & (row_dl > 0) & (size > 0)
    per_row = jnp.where(counted, (lse - logits2) / jnp.maximum(size, 1.0), 0.0)
    return targets, jnp.sum(per_row)


def step_losses(out_scores, out_logits, label, is_det, past, fut, live, tp_classifier: bool):
    """One step's (loss_ce, loss_focal, f1 counts) as in ref train.py:70-88."""
    targets, l_ce = targets_and_ce(out_logits, label, is_det, past, fut, live)
    edge_mask = live & ~is_det
    node_mask = live & is_det
    if tp_classifier:
        l_f = bce_loss(out_scores, targets, node_mask) + bce_loss(out_scores, targets, edge_mask)
    else:
        l_f = bce_loss(out_scores, targets, edge_mask)
    tp, fp, fn = f1_counts(out_scores, targets, is_det, live, tp_classifier)
    return l_ce, l_f, (tp, fp, fn), targets
