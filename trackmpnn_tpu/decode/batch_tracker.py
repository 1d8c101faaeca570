"""Batched multi-sequence inference: serving-throughput tracking.

The reference tracks one sequence at a time with a per-timestep
host<->device round trip (batch size is hard-asserted to 1,
graph.py:117).  Here K sequences advance in lockstep: each global
iteration does all K host-side graph plans (C++ planner), stacks the
padded views, and issues ONE vmapped device forward for the whole batch -
K times fewer dispatches and far better chip utilization from batched
matmuls.  Per-sequence results are identical to the single-sequence
Tracker (asserted in tests): the state machine below is the same
init -> [update -> forward -> decode] loop with graph-empty re-init.

On top of the batching, `run(pipeline=True)` double-buffers two cohorts
so the host-side planning/decode of one cohort overlaps the device
forward of the other (JAX dispatch is async; only np.asarray blocks) —
the serving loop is otherwise strictly host-then-device serial.

The hidden state is DEVICE-RESIDENT across steps: the host never reads
its values — it only drops/permutes rows (prune + decode keeps, new-row
appends), and `engine.decode_tracks`/`engine.prune` already return that
plan as kept-row index vectors.  Each step uploads the [K, cap] gather
plan and downloads only the [K, cap] scores; the [K, cap, nb*H] hidden
tensor never crosses the (slow, single-chip-tunnel) host link.  Measured
round 3: shipping hidden both ways was ~6 MB/step at K=16 and dominated
serving wall clock (18.9 frames/s); see docs/RESULTS.md.
"""

from __future__ import annotations

import time
from collections import defaultdict
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.decode.tracker import (TrackerConfig, _bucketed,
                                          scores2_from_probs)
from trackmpnn_tpu.graph import engine
from trackmpnn_tpu.graph.view import GraphView, pack_slots
from trackmpnn_tpu.models import mpnn


def _forward_impl(params, batch_stats, cfg, g: GraphView, h):
    def one(g1, h1):
        out, _ = mpnn.forward(params, batch_stats, cfg, g1, h1, train=False)
        return out.scores, out.hidden

    return jax.vmap(one)(g, h)


_batched_forward = partial(jax.jit, static_argnames=("cfg",))(_forward_impl)


def _gather_hidden(src, lanes, rows):
    """Device-side hidden re-layout between steps.

    src   f32[Ks, cap_old, H] — the previous forward's hidden output
    lanes i32[K]              — each sequence's lane in src
    rows  i32[K, cap_new]     — old row per new row, -1 = fresh (zero) row

    Composes the host's keep/permutation plan without the hidden values
    ever leaving the device.
    """
    safe = jnp.clip(rows, 0, src.shape[1] - 1)
    h = src[lanes[:, None], safe]
    return jnp.where((rows >= 0)[..., None], h, 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def _batched_forward_gather(params, batch_stats, cfg, g: GraphView, src,
                            lanes, rows):
    """Gather-then-forward in ONE program: through the single-chip tunnel
    every dispatch pays a round-trip, so the between-steps hidden re-layout
    rides the forward's launch instead of its own."""
    return _forward_impl(params, batch_stats, cfg, g,
                         _gather_hidden(src, lanes, rows))


class _SeqState:
    """Single sequence's host-side rolling state (mirrors Tracker.run)."""

    def __init__(self, X, y_seq, cfg: TrackerConfig, nb_hidden: int):
        self.X = X
        self.y = y_seq.astype(np.int64)
        self.cfg = cfg
        self.nbh = nb_hidden
        self.y_out = self.y.copy()
        self.y_out[:, 1] = -1
        # device-resident hidden: (src array, lane) + kept-row plan; the host
        # never holds hidden VALUES, only the row indices into hid_src
        self.hid_src = None          # jax f32[Ks, cap_old, H] or None
        self.hid_lane = 0
        self.hid_rows: Optional[np.ndarray] = None  # int32[g.n - n_new]
        self.scores2 = np.zeros((0, 2), np.float32)
        self.g: Optional[engine.RollingGraph] = None
        self.phase = "init"       # init | loop | done
        self.t_cur = 0
        self.t_skip = 0
        self.t_end = 0
        self.n_new = 0
        if X.shape[0] == 0:
            self.phase = "done"

    # ------------------------------------------------------------ prepare --
    def prepare(self) -> bool:
        """Advance host state to the next forward; returns False when done."""
        c = self.cfg
        if self.phase == "done":
            return False
        if self.phase == "init":
            self.g = engine.initialize(self.y, 0, mode="test")
            if self.g is None:
                self.phase = "done"
                return False
            self.t_skip = self.g.t_next
            self.t_cur = self.t_skip
            self.t_end = self.g.t_end
            self.n_new = self.g.n
            self.hid_src, self.hid_rows = None, None
            self.phase = "after_init"
            return True
        # loop body: find the next timestep needing work
        while self.t_cur < self.t_end and self.t_cur < self.t_skip:
            self.t_cur += 1
        if self.t_cur >= self.t_end:
            self.phase = "done"
            return False
        if self.g.n == 0:
            g = engine.initialize(self.y, self.t_cur, mode="test")
            if g is None:
                self.phase = "done"
                return False
            self.g = g
            self.t_skip = g.t_next
            self.n_new = g.n
            self.hid_src, self.hid_rows = None, None
        else:
            self.n_new = engine.update(self.g, self.y, self.t_cur, self.scores2,
                                       mode="test", use_hungarian=c.hungarian)
        self.phase = "after_update"
        return True

    # ------------------------------------------------------------ consume --
    def consume(self, probs: np.ndarray, hid_src, lane: int, on_step=None):
        c = self.cfg
        n = self.g.n
        probs = probs[:n]
        self.hid_src, self.hid_lane = hid_src, lane
        rows = np.arange(n, dtype=np.int32)
        self.scores2 = scores2_from_probs(self.g, probs, c.tp_classifier)
        if on_step is not None:
            on_step(self.g, self.scores2)
        if self.phase == "after_init":
            self.hid_rows = rows
            self.phase = "loop"
            return
        if c.prune_threshold is not None and self.g.n > 0:
            keep = engine.prune(
                self.g, self.scores2,
                int(self.g.ts[self.g.ts != -1].min())
                if np.any(self.g.ts != -1) else 0,
                self.t_cur, c.prune_threshold)
            rows = rows[keep]
            self.scores2 = self.scores2[keep]
        t_upto = self.t_end if self.t_cur == self.t_end - 1 else \
            self.t_cur - c.cur_win_size + 2
        keep = engine.decode_tracks(self.g, self.scores2, self.y_out, t_upto,
                                    c.ret_win_size, use_hungarian=c.hungarian)
        self.hid_rows = rows[keep]
        self.scores2 = self.scores2[keep]
        self.t_cur += 1
        self.phase = "loop"

    # --------------------------------------------------------------- view --
    def view(self, cap: int, nfeats: int):
        g = self.g
        is_det, past, fut, feat = pack_slots(g, self.X, cap)
        idx = np.arange(cap, dtype=np.int32)
        live = idx < g.n
        new = (idx >= g.n - self.n_new) & live
        rows = np.full(cap, -1, np.int32)  # device gather plan; -1 = zero row
        if self.hid_rows is not None and self.hid_rows.shape[0]:
            m = min(self.hid_rows.shape[0], cap)
            rows[:m] = self.hid_rows[:m]
        return is_det, past, fut, live, new, feat, rows


class BatchedTracker:
    """Tracks K sequences with one vmapped device call per global step."""

    def __init__(self, params, batch_stats, model_cfg: mpnn.ModelConfig,
                 cfg: TrackerConfig):
        self.params = params
        self.batch_stats = batch_stats
        self.model_cfg = model_cfg
        self.cfg = cfg

    def run(self, sequences: List, on_step=None,
            pipeline: bool = True, profile: bool = False) -> List[np.ndarray]:
        """sequences: list of (X [N,F], y_seq [N,2]).  Returns y_out list.
        on_step(seq_index, graph, scores2) fires after every forward.

        pipeline=True (default, needs >=2 sequences) splits the batch into
        two cohorts and double-buffers them: JAX dispatch is asynchronous,
        so while the device runs cohort A's forward the host decodes,
        prunes and re-plans cohort B (the C++ planner + Hungarian work that
        otherwise serializes with the chip).  Per-sequence results are
        identical to lockstep — sequences never interact — only the
        cross-sequence interleaving of on_step callbacks changes."""
        mc = self.model_cfg
        nbh = len(mc.branches) * mc.nhidden
        states = [_SeqState(X, y, self.cfg, nbh) for X, y in sequences]
        nfeats = mc.nfeatures
        seq_idx = {id(s): i for i, s in enumerate(states)}
        # per-phase wall-clock breakdown (profile=True): plan = host graph
        # planning (engine.update/initialize incl. Hungarian + C++ planner),
        # pack = numpy view packing + stacking, dispatch = upload + async
        # program enqueue, block = np.asarray(scores) (device compute +
        # score download + tunnel RTT), decode = host decode_tracks/prune.
        self.phase_s = defaultdict(float) if profile else None
        self.n_steps = 0
        _t = time.perf_counter if profile else None

        def launch(cohort):
            """Host-plan the cohort and dispatch ONE async device forward."""
            t0 = _t() if profile else 0
            active = [s for s in cohort if s.prepare()]
            if not active:
                return None
            if profile:
                t1 = _t()
                self.phase_s["plan"] += t1 - t0
                self.n_steps += 1
            cap = _bucketed(max(s.g.n for s in active), self.cfg.bucket)
            views = [s.view(cap, nfeats) for s in active]
            stack = lambda i: jnp.asarray(np.stack([v[i] for v in views]))
            if profile:
                self.phase_s["pack"] += _t() - t1
                t1 = _t()
            g = GraphView(is_det=stack(0), past=stack(1), fut=stack(2),
                          live=stack(3), new=stack(4), feat=stack(5))
            # hidden stays on device: compose the keep/permutation plan as a
            # gather fused into the forward program (one dispatch per step)
            srcs = {id(s.hid_src): s.hid_src for s in active
                    if s.hid_src is not None}
            if not srcs:
                h = jnp.zeros((len(active), cap, nbh), jnp.float32)
                scores, hidden = _batched_forward(
                    self.params, self.batch_stats, mc, g, h)
            else:
                assert len(srcs) == 1, \
                    "cohort members must share one hidden source array"
                (src,) = srcs.values()
                lanes = np.array([s.hid_lane for s in active], np.int32)
                scores, hidden = _batched_forward_gather(
                    self.params, self.batch_stats, mc, g, src,
                    jnp.asarray(lanes), stack(6))
            if profile:
                self.phase_s["dispatch"] += _t() - t1
            return active, scores, hidden

        def consume(inflight):
            """Block on the cohort's scores and decode; hidden stays device-side."""
            active, scores, hidden = inflight
            t0 = _t() if profile else 0
            scores = np.asarray(scores)
            if profile:
                t1 = _t()
                self.phase_s["block"] += t1 - t0
            for k, s in enumerate(active):
                cb = (lambda g, sc, _i=seq_idx[id(s)]: on_step(_i, g, sc)) \
                    if on_step is not None else None
                s.consume(scores[k], hidden, k, on_step=cb)
            if profile:
                self.phase_s["decode"] += _t() - t1

        if pipeline and len(states) >= 2:
            mid = (len(states) + 1) // 2
            cohorts = (states[:mid], states[mid:])
            inflight = [launch(cohorts[0]), launch(cohorts[1])]
            turn = 0
            while inflight[0] is not None or inflight[1] is not None:
                if inflight[turn] is not None:
                    consume(inflight[turn])
                    inflight[turn] = launch(cohorts[turn])
                turn ^= 1
        else:
            while True:
                fl = launch(states)
                if fl is None:
                    break
                consume(fl)

        return [s.y_out for s in states]
