"""The jit'd training step: one `lax.scan` per rolling window.

Consumes a WindowSchedule (host-precomputed teacher-forced graph growth,
see graph/schedule.py) and runs forward + losses for every timestep of the
window inside a single XLA program, then backward through all of it at once
- the truncated-BPTT-through-the-whole-chunk structure of the reference
(train.py:92-134) without its per-step host round trips.

Loss composition per window (ref train.py:132): sum over steps of the
per-detection CE plus the BCE/focal terms, all computed on padded static
shapes with masks.  Invalid (padding) steps contribute nothing and leave
carried state untouched.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.losses import step_losses
from trackmpnn_tpu.models import mpnn


class ScheduleBatch(NamedTuple):
    """Device-side WindowSchedule (see graph/schedule.py for field docs)."""

    is_det: jnp.ndarray      # bool[cap]
    past: jnp.ndarray        # int32[cap]
    fut: jnp.ndarray         # int32[cap]
    label: jnp.ndarray       # int32[cap]
    feat: jnp.ndarray        # f32[cap, F]
    n_before: jnp.ndarray    # int32[t_cap]
    n_after: jnp.ndarray     # int32[t_cap]
    step_valid: jnp.ndarray  # bool[t_cap]


def schedule_to_device(ws) -> ScheduleBatch:
    return ScheduleBatch(
        is_det=jnp.asarray(ws.is_det),
        past=jnp.asarray(ws.past),
        fut=jnp.asarray(ws.fut),
        label=jnp.asarray(ws.label),
        feat=jnp.asarray(ws.feat),
        n_before=jnp.asarray(ws.n_before),
        n_after=jnp.asarray(ws.n_after),
        step_valid=jnp.asarray(ws.step_valid),
    )


def window_forward(params, batch_stats, cfg: mpnn.ModelConfig, sb: ScheduleBatch,
                   tp_classifier: bool, train: bool = True, rng=None):
    """Scan the window. Returns (total_loss, aux) where aux carries
    per-step f1 counts, the final hidden state, and updated batch stats.

    rng: PRNG key for GAT attention dropout; required when training with
    nattheads > 0 (folded per scan step)."""
    cap = sb.is_det.shape[0]
    nb = len(cfg.branches)
    idx = jnp.arange(cap, dtype=jnp.int32)
    h0 = jnp.zeros((cap, nb * cfg.nhidden), jnp.float32)
    if train and cfg.nattheads > 0 and rng is None:
        raise ValueError("training with GAT heads needs an rng key for "
                         "attention dropout (pass rng=...)")

    def step(carry, s):
        h, stats = carry
        n_b, n_a, valid = sb.n_before[s], sb.n_after[s], sb.step_valid[s]
        live = (idx < n_a) & valid
        new = (idx >= n_b) & live
        g = GraphView(is_det=sb.is_det, past=sb.past, fut=sb.fut,
                      live=live, new=new, feat=sb.feat)
        rng_s = jax.random.fold_in(rng, s) if rng is not None else None
        out, stats_new = mpnn.forward(params, stats, cfg, g, h, train=train,
                                      rng=rng_s)
        l_ce, l_f, (tp, fp, fn), _ = step_losses(
            out.scores, out.logits, sb.label, sb.is_det, sb.past, sb.fut,
            live, tp_classifier,
        )
        # padding steps: keep state, contribute zero loss
        h_next = jnp.where(valid, out.hidden, h)
        stats_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(valid, a, b), stats_new, stats
        )
        zero = jnp.float32(0.0)
        l_ce = jnp.where(valid, l_ce, zero)
        l_f = jnp.where(valid, l_f, zero)
        return (h_next, stats_next), (l_ce, l_f, tp, fp, fn, valid)

    (h_fin, stats_fin), (l_ce, l_f, tp, fp, fn, valid) = jax.lax.scan(
        step, (h0, batch_stats), jnp.arange(sb.n_before.shape[0])
    )
    total = jnp.sum(l_ce) + jnp.sum(l_f)
    aux = {
        "loss_ce": jnp.sum(l_ce),
        "loss_f": jnp.sum(l_f),
        "tp": tp, "fp": fp, "fn": fn, "step_valid": valid,
        "hidden": h_fin,
        "batch_stats": stats_fin,
    }
    return total, aux


def make_train_step(cfg: mpnn.ModelConfig, tx, tp_classifier: bool,
                    return_grads: bool = False):
    """Build the jit'd (params, batch_stats, opt_state, schedule) -> update fn.

    return_grads=True also returns the gradient pytree in the aux dict
    (for gradient-flow plots, ref train.py:140-145 / utils/gradients.py)."""

    def loss_fn(params, batch_stats, sb, rng):
        return window_forward(params, batch_stats, cfg, sb, tp_classifier,
                              train=True, rng=rng)

    @jax.jit
    def step(params, batch_stats, opt_state, sb: ScheduleBatch, rng=None):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, sb, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        out_aux = {
            k: aux[k] for k in ("loss_ce", "loss_f", "tp", "fp", "fn", "step_valid")
        }
        if return_grads:
            out_aux["grads"] = grads
        return params, aux["batch_stats"], opt_state, loss, out_aux

    return step


def make_eval_window(cfg: mpnn.ModelConfig, tp_classifier: bool):
    @jax.jit
    def run(params, batch_stats, sb: ScheduleBatch):
        loss, aux = window_forward(params, batch_stats, cfg, sb, tp_classifier, train=False)
        return loss, aux
    return run
