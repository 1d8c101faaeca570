"""Device-side graph representation: padded, static-shape, index-based.

The reference materializes an N x N (sparse) adjacency whose off-diagonal
pattern encodes, per association ("edge") row, a +1 at the past detection
column and a -1 at the future detection column
(/root/reference/utils/graph.py:152-158).  Row order is load-bearing there
("first nonzero = past endpoint").  On TPU we store the same information
explicitly and shape-statically:

  * every graph row is a "slot" (detection node or association/edge node),
    numbered in exactly the reference's append order so index-order-dependent
    tie-breaks reproduce bit-for-bit;
  * an edge slot carries the slot ids of its two detection endpoints
    (`past`, `fut`); detections carry self-indices (inert under masks);
  * `live` masks the currently-active window; `new` masks rows introduced at
    the current step (these - including zero-feature edge rows - are what the
    input MLP + BatchNorm see, matching track_mpnn.py:58-61 semantics).

Message passing then never builds a matrix: node_adj @ h becomes a
two-gather subtract, edge_adj @ h a signed segment-sum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class GraphView(NamedTuple):
    """One step's padded view of the rolling-window graph (capacity N)."""

    is_det: jnp.ndarray  # bool[N]  True = detection slot, False = edge slot
    past: jnp.ndarray    # int32[N] past-endpoint slot id (edges; self for dets)
    fut: jnp.ndarray     # int32[N] future-endpoint slot id
    live: jnp.ndarray    # bool[N]  slot active at this step
    new: jnp.ndarray     # bool[N]  slot introduced at this step
    feat: jnp.ndarray    # f32[N,F] input features (zeros for edge slots)

    @property
    def capacity(self):
        return self.is_det.shape[0]

    def edge_mask(self):
        return self.live & ~self.is_det

    def det_mask(self):
        return self.live & self.is_det


def pack_slots(g, X: np.ndarray, cap: int):
    """Pad a RollingGraph's slot arrays to `cap` (host-side, numpy).

    The one place the slot layout is defined: is_det from ts != -1, edge
    endpoints scattered onto self-index identity, detection features
    gathered by det_id.  Returns (is_det, past, fut, feat) — callers add
    their own live/new/label/hidden fields on top.  Shared by
    Tracker._view, BatchedTracker._SeqState.view and
    build_window_schedule so the training and inference views cannot
    drift."""
    n = g.n
    idx = np.arange(cap, dtype=np.int32)
    is_det = np.zeros(cap, bool)
    is_det[:n] = g.ts != -1
    past = idx.copy()
    fut = idx.copy()
    er = np.where(g.ts == -1)[0]
    past[er] = g.past[er]
    fut[er] = g.fut[er]
    feat = np.zeros((cap, X.shape[1]), np.float32)
    dr = np.where(g.ts != -1)[0]
    feat[dr] = X[g.det_id[dr]]
    return is_det, past, fut, feat


def empty_view(capacity: int, nfeats: int) -> GraphView:
    idx = np.arange(capacity, dtype=np.int32)
    return GraphView(
        is_det=jnp.zeros((capacity,), bool),
        past=jnp.asarray(idx),
        fut=jnp.asarray(idx),
        live=jnp.zeros((capacity,), bool),
        new=jnp.zeros((capacity,), bool),
        feat=jnp.zeros((capacity, nfeats), jnp.float32),
    )
