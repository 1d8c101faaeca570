"""Rolling-window inference: device scoring + host association planning.

Inference association is inherently sequential (each frame's graph update
depends on the previous scores, ref infer.py:48-87), so unlike training it
cannot be a single scan.  The TPU-native structure is: the model forward is
one jit'd program over a *bucketed* padded capacity (recompiles bounded to
the handful of bucket sizes), the host engine plans index updates, and the
only per-step transfers are the tiny score vector down and the new-row
index plan up.  Hidden state stays in padded row order; decode shrinkage is
applied with the engine's keep-plan gather.

Mirrors the reference driver loop semantics exactly:
  - initialize -> forward -> per-timestep [update -> forward -> decode]
    (ref infer.py:48-87, train.py:223-260 for the val variant)
  - graph emptied => re-initialize from the current timestep
    (ref infer.py:64-69)
  - final timestep decodes the whole remaining window (t_upto = t_end)
  - when the TP-classifier head is off, detections are forced TP
    (ref infer.py:53-56)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.graph import engine
from trackmpnn_tpu.graph.view import GraphView, pack_slots
from trackmpnn_tpu.models import mpnn


@dataclass
class TrackerConfig:
    cur_win_size: int = 5
    ret_win_size: int = 0
    hungarian: bool = True
    tp_classifier: bool = True
    bucket: int = 256  # capacity rounding; bounds the number of XLA programs
    # optional low-score edge pruning each step (the reference ships
    # prune_graph but never calls it, graph.py:337-389; off by default)
    prune_threshold: Optional[float] = None


def _bucketed(n: int, bucket: int) -> int:
    if n <= bucket:
        return bucket
    cap = bucket
    while cap < n:
        cap *= 2
    return cap


def _step_impl(params, batch_stats, cfg, g: GraphView, h_prev, train):
    out, stats = mpnn.forward(params, batch_stats, cfg, g, h_prev, train=train)
    return out.scores, out.logits, out.hidden, out.attention


@partial(jax.jit, static_argnames=("cfg", "train"))
def _forward_step(params, batch_stats, cfg, g: GraphView, h_prev, train=False):
    return _step_impl(params, batch_stats, cfg, g, h_prev, train)


@partial(jax.jit, static_argnames=("cfg",))
def _forward_step_gather(params, batch_stats, cfg, g: GraphView, src, rows):
    """Re-layout the device-resident hidden and run the forward in ONE
    program: new row i takes src[rows[i]], rows[i] == -1 means a fresh
    (zero) row.  The keep plans from engine.prune/decode_tracks compose on
    host as index vectors; only this tiny int32[cap] plan crosses the host
    link, never the hidden values — and through the single-chip tunnel the
    gather rides the forward's dispatch instead of paying its own."""
    safe = jnp.clip(rows, 0, src.shape[0] - 1)
    h_prev = jnp.where((rows >= 0)[:, None], src[safe], 0.0)
    return _step_impl(params, batch_stats, cfg, g, h_prev, False)


def scores2_from_probs(g: "engine.RollingGraph", probs: np.ndarray,
                       tp_classifier: bool) -> np.ndarray:
    """(1-p, p) rows; detections forced TP without the classifier head
    (ref infer.py:53-56).  Shared by Tracker and BatchedTracker so the
    forced-TP rule cannot silently diverge between them."""
    s = np.stack([1.0 - probs, probs], axis=1).astype(np.float32)
    if not tp_classifier:
        det = g.ts != -1
        s[det, 0] = 0.0
        s[det, 1] = 1.0
    return s


class Tracker:
    """Runs full-sequence tracking with a trained model."""

    def __init__(self, params, batch_stats, model_cfg: mpnn.ModelConfig, cfg: TrackerConfig):
        self.params = params
        self.batch_stats = batch_stats
        self.model_cfg = model_cfg
        self.cfg = cfg

    # ------------------------------------------------------------ helpers --
    def _view(self, g: engine.RollingGraph, X: np.ndarray, n_new: int, cap: int) -> GraphView:
        is_det, past, fut, feat = pack_slots(g, X, cap)
        idx = np.arange(cap, dtype=np.int32)
        live = idx < g.n
        new = (idx >= g.n - n_new) & live
        return GraphView(
            is_det=jnp.asarray(is_det), past=jnp.asarray(past), fut=jnp.asarray(fut),
            live=jnp.asarray(live), new=jnp.asarray(new), feat=jnp.asarray(feat),
        )

    def _scores2(self, g: engine.RollingGraph, probs: np.ndarray) -> np.ndarray:
        return scores2_from_probs(g, probs, self.cfg.tp_classifier)

    def _run_forward(self, g, X, n_new, rows):
        """rows: int32[g.n - n_new] gather plan into the previous forward's
        hidden output (device-resident, self._hid_src), or None for a fresh
        zero state.  Returns host (probs, logits); the new hidden stays on
        device as self._hid_src."""
        cap = _bucketed(g.n, self.cfg.bucket)
        view = self._view(g, X, n_new, cap)
        if rows is None or getattr(self, "_hid_src", None) is None:
            scores, logits, hidden, attention = _forward_step(
                self.params, self.batch_stats, self.model_cfg, view, None,
                False)  # mpnn.forward starts from zeros
        else:
            rows_pad = np.full(cap, -1, np.int32)
            m = min(len(rows), cap)
            rows_pad[:m] = rows[:m]
            scores, logits, hidden, attention = _forward_step_gather(
                self.params, self.batch_stats, self.model_cfg, view,
                self._hid_src, jnp.asarray(rows_pad))
        self._hid_src = hidden
        n = g.n
        if attention is not None:
            # per branch, per head: doubled-incidence weights [2*cap]
            # (first cap entries = past-endpoint neighborhoods, rest = future)
            self.last_attention = jax.tree_util.tree_map(np.asarray, attention)
        else:
            self.last_attention = None
        return (
            np.asarray(scores)[:n],
            np.asarray(logits)[:n],
        )

    # ---------------------------------------------------------------- run --
    def run(self, X: np.ndarray, y_seq: np.ndarray, progress=None, on_step=None) -> np.ndarray:
        """Track one sequence.

        X: f32[num_dets, F] normalized features; y_seq: int64[num_dets, 2]
        rows (ts, det-track placeholder) - only column 0 (frame) is read.
        Returns y_out int64[num_dets, 2]: (frame, track_id), -1 = untracked.
        """
        num_dets = X.shape[0]
        y_out = y_seq.copy().astype(np.int64)
        y_out[:, 1] = -1
        if num_dets == 0:
            return y_out

        g = engine.initialize(y_seq, 0, mode="test")
        if g is None:
            return y_out
        self._hid_src = None
        probs, _ = self._run_forward(g, X, g.n, None)
        rows = np.arange(g.n, dtype=np.int32)
        scores2 = self._scores2(g, probs)
        if on_step is not None:
            on_step(g, scores2)

        t_skip = g.t_next
        t_end = g.t_end
        for t_cur in range(t_skip, t_end):
            if t_cur < t_skip:
                continue
            if g.n == 0:
                g = engine.initialize(y_seq, t_cur, mode="test")
                if g is None:
                    break
                t_skip = g.t_next  # frames consumed by re-init are skipped above
                self._hid_src = None
                probs, _ = self._run_forward(g, X, g.n, None)
                scores2 = self._scores2(g, probs)
            else:
                n_new = engine.update(
                    g, y_seq, t_cur, scores2, mode="test", use_hungarian=self.cfg.hungarian
                )
                probs, _ = self._run_forward(g, X, n_new, rows)
                scores2 = self._scores2(g, probs)
            rows = np.arange(g.n, dtype=np.int32)

            if on_step is not None:
                on_step(g, scores2)
            if self.cfg.prune_threshold is not None and g.n > 0:
                keep = engine.prune(g, scores2, int(g.ts[g.ts != -1].min()) if
                                    np.any(g.ts != -1) else 0, t_cur,
                                    self.cfg.prune_threshold)
                rows = rows[keep]
                scores2 = scores2[keep]
            t_upto = t_end if t_cur == t_end - 1 else t_cur - self.cfg.cur_win_size + 2
            keep = engine.decode_tracks(
                g, scores2, y_out, t_upto, self.cfg.ret_win_size,
                use_hungarian=self.cfg.hungarian,
            )
            rows = rows[keep]
            scores2 = scores2[keep]
            if progress is not None:
                progress(t_cur, t_end)

        return y_out
