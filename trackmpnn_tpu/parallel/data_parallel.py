"""SPMD training over a device mesh: DP over windows x slot-axis sharding.

The GSPMD route: batch teacher-forced window schedules on a leading axis,
annotate the batch axis with the 'data' mesh axis and the slot (graph-row)
axis with the 'edge' mesh axis, and jit the batched scanned train step.
XLA partitions the row-wise GRU/MLP matmuls across 'edge' and inserts the
collectives (segment-sum partial reductions, gather halos) that the
reference - which has no parallelism at all - never had.

BN note: per reference semantics each window updates BatchNorm running
stats sequentially; under DP the per-window final stats are averaged across
the batch (the standard sync-BN choice for a net-new capability).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train.step import ScheduleBatch, window_forward


def batch_schedules(schedules: List, cap: int, t_cap: int) -> ScheduleBatch:
    """Stack host WindowSchedules (already padded to cap/t_cap) into [B, ...]."""

    def stack(field):
        return jnp.asarray(np.stack([getattr(ws, field) for ws in schedules]))

    return ScheduleBatch(
        is_det=stack("is_det"), past=stack("past"), fut=stack("fut"),
        label=stack("label"), feat=stack("feat"),
        n_before=stack("n_before"), n_after=stack("n_after"),
        step_valid=stack("step_valid"),
    )


def batched_window_forward(params, batch_stats, cfg, sbatch: ScheduleBatch, tp_classifier,
                           train=True, rng=None):
    """vmap window_forward over the leading batch axis; mean loss, averaged
    batch-stat updates.  rng (needed to train with GAT heads) is split per
    window so attention-dropout masks are independent across the batch."""

    if rng is not None:
        keys = jax.random.split(rng, sbatch.is_det.shape[0])
        loss, aux = jax.vmap(
            lambda sb, k: window_forward(params, batch_stats, cfg, sb,
                                         tp_classifier, train=train, rng=k)
        )(sbatch, keys)
    else:
        loss, aux = jax.vmap(
            lambda sb: window_forward(params, batch_stats, cfg, sb,
                                      tp_classifier, train=train)
        )(sbatch)
    mean_loss = jnp.mean(loss)
    stats_new = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), aux["batch_stats"])
    out_aux = {
        "loss_ce": jnp.mean(aux["loss_ce"]),
        "loss_f": jnp.mean(aux["loss_f"]),
        "tp": jnp.sum(aux["tp"]), "fp": jnp.sum(aux["fp"]), "fn": jnp.sum(aux["fn"]),
        "batch_stats": stats_new,
    }
    return mean_loss, out_aux


def _schedule_shardings(mesh: Mesh, edge_axis: Optional[str]) -> ScheduleBatch:
    """Per-field PartitionSpecs: batch over 'data', slot axis over edge_axis."""
    e = edge_axis
    return ScheduleBatch(
        is_det=P("data", e), past=P("data", e), fut=P("data", e),
        label=P("data", e), feat=P("data", e, None),
        n_before=P("data"), n_after=P("data"), step_valid=P("data"),
    )


def make_sharded_train_step(mesh: Mesh, cfg: mpnn.ModelConfig, tx, tp_classifier: bool,
                            edge_axis: Optional[str] = None):
    """jit'd SPMD train step over `mesh`.

    Batch axis (leading) shards over 'data'; with edge_axis given, per-slot
    arrays also shard over it so row-wise compute splits across that axis.
    Params/optimizer state are replicated; gradients reduce across the mesh
    via XLA-inserted collectives from the mean loss.
    """
    repl = NamedSharding(mesh, P())
    sched_specs = _schedule_shardings(mesh, edge_axis)
    sched_shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), sched_specs,
        is_leaf=lambda x: isinstance(x, P),
    )

    def _make_step(with_rng: bool):
        def loss_fn(params, batch_stats, sbatch, rng):
            return batched_window_forward(params, batch_stats, cfg, sbatch,
                                          tp_classifier, rng=rng)

        in_sh = (repl, repl, repl, sched_shardings) + ((repl,) if with_rng else ())

        @partial(jax.jit, in_shardings=in_sh, out_shardings=None,
                 donate_argnums=(0, 1, 2))
        def step(params, batch_stats, opt_state, sbatch, *maybe_rng):
            rng = maybe_rng[0] if maybe_rng else None
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, sbatch, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, aux["batch_stats"], opt_state, loss, {
                k: aux[k] for k in ("loss_ce", "loss_f", "tp", "fp", "fn")
            }

        return step

    steps = {}

    def run(params, batch_stats, opt_state, sbatch: ScheduleBatch, rng=None):
        sbatch = jax.device_put(sbatch, sched_shardings)
        with_rng = rng is not None
        if with_rng not in steps:
            steps[with_rng] = _make_step(with_rng)
        extra = (rng,) if with_rng else ()
        return steps[with_rng](params, batch_stats, opt_state, sbatch, *extra)

    return run
