"""Masked segment reductions — the sparse primitives of the graph engine.

The reference implements neighborhood aggregation as dense/sparse N x N
matmuls (`torch.sparse.mm`, /root/reference/models/layers.py:95,103).  On TPU
we never materialize adjacency: every edge knows its two detection endpoints,
so aggregation is a gather + signed segment reduction.  XLA lowers
`jax.ops.segment_sum` to efficient scatter-adds; all ops here take an
explicit validity mask so padded rows are inert.

All functions are jit-/vmap-/grad-safe with static `num_segments`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_LARGE = -1e30
_POS_LARGE = 1e30


def segment_sum(values, segment_ids, num_segments, mask=None):
    """Sum `values` rows into `num_segments` buckets; masked rows contribute 0."""
    if mask is not None:
        shape = values.shape[:1] + (1,) * (values.ndim - 1)
        values = jnp.where(mask.reshape(shape), values, 0)
        # route masked rows to a scratch bucket so bad ids in padding are harmless
        segment_ids = jnp.where(mask, segment_ids, num_segments)
    out = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_max(values, segment_ids, num_segments, mask=None, initial=_NEG_LARGE):
    """Max-reduce into buckets. Empty buckets hold `initial`."""
    if mask is not None:
        shape = values.shape[:1] + (1,) * (values.ndim - 1)
        values = jnp.where(mask.reshape(shape), values, initial)
        segment_ids = jnp.where(mask, segment_ids, num_segments)
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments + 1)
    out = jnp.maximum(out, initial)  # fill -inf empties deterministically
    return out[:num_segments]


def segment_min(values, segment_ids, num_segments, mask=None, initial=_POS_LARGE):
    """Min-reduce into buckets. Empty buckets hold `initial`."""
    if mask is not None:
        shape = values.shape[:1] + (1,) * (values.ndim - 1)
        values = jnp.where(mask.reshape(shape), values, initial)
        segment_ids = jnp.where(mask, segment_ids, num_segments)
    out = jax.ops.segment_min(values, segment_ids, num_segments=num_segments + 1)
    out = jnp.minimum(out, initial)
    return out[:num_segments]


def segment_argmax(values, segment_ids, num_segments, mask=None, tie="high"):
    """Index (into `values`) of the max element per segment; -1 if empty.

    `tie="high"` breaks ties toward the *largest* index, matching the
    reference's "use the edge connected to the latest positive detection"
    rule (/root/reference/models/loss.py:28-30) on 0/1 indicators;
    `tie="low"` toward the smallest (numpy argmax semantics, used by the
    greedy decode's `np.argmax`, /root/reference/utils/graph.py:265).
    """
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    full = jnp.ones(n, bool) if mask is None else mask
    m = segment_max(values.astype(jnp.float32), segment_ids, num_segments, mask=mask)
    has = m > _NEG_LARGE / 2
    row_best = m[jnp.clip(segment_ids, 0, num_segments - 1)]
    winner = (values.astype(jnp.float32) == row_best) & full
    if tie == "high":
        out = segment_max(jnp.where(winner, idx, -1), segment_ids, num_segments, mask=mask, initial=-1)
    else:
        out = segment_min(jnp.where(winner, idx, n + 1), segment_ids, num_segments, mask=mask, initial=n + 1)
        out = jnp.where(out > n, -1, out)
    return jnp.where(has, out.astype(jnp.int32), -1)


def segment_argmin(values, segment_ids, num_segments, mask=None, tie="low"):
    """Index of the min element per segment; -1 if empty. Default ties -> smallest index."""
    return segment_argmax(-values, segment_ids, num_segments, mask=mask, tie=tie)


def segment_logsumexp(logits, segment_ids, num_segments, mask=None):
    """Numerically-stable per-segment logsumexp; empty segments -> -inf proxy."""
    m = segment_max(logits, segment_ids, num_segments, mask=mask)
    safe_m = jnp.where(m > _NEG_LARGE / 2, m, 0.0)
    shifted = logits - safe_m[jnp.clip(segment_ids, 0, num_segments - 1)]
    e = jnp.exp(shifted)
    s = segment_sum(e, segment_ids, num_segments, mask=mask)
    out = safe_m + jnp.log(jnp.maximum(s, 1e-30))
    return jnp.where(m > _NEG_LARGE / 2, out, _NEG_LARGE)


def segment_softmax(logits, segment_ids, num_segments, mask=None):
    """Per-segment softmax over rows; masked rows get 0.

    The lse is clamped before exponentiation: a masked row whose clipped
    segment id lands on an EMPTY bucket would otherwise see exp(x + 1e30)
    = inf in the (masked-out) forward value, and the backward pass turns
    that into inf * 0 = NaN gradients.  Unmasked rows always belong to a
    non-empty segment, so the clamp never changes a real output."""
    lse = segment_logsumexp(logits, segment_ids, num_segments, mask=mask)
    safe_lse = jnp.where(lse > _NEG_LARGE / 2, lse, 0.0)
    out = jnp.exp(logits - safe_lse[jnp.clip(segment_ids, 0, num_segments - 1)])
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out
