"""Data-parallel block-structured training: the fast path, sharded.

The GSPMD row-layout path (data_parallel.py) vmaps the scanned window
forward, which forfeits the block step's scatter-free reductions and the
fused Pallas round (Pallas kernels also serialize under vmap — CLAUDE.md).
Here the windows themselves are the parallel axis: every BlockBatch array
is window-major on its leading dim, and windows never reference each
other's detection slots, so `shard_map` over 'data' hands each device a
self-contained local BlockBatch and the full single-device fast path
(block reductions + fused kernel) runs unchanged per shard.  Cross-shard
communication is exactly what data parallelism requires and nothing else:
BatchNorm moment psums (sync-BN, matching the single-device cross-window
batch statistics bit-for-bit in expectation), the loss/metric psums, and
the gradient reduction XLA derives from them.

Local detection ids are rebased by `axis_index('data') * B_local * capD`
inside the shard — the only layout fact the wrapper needs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train.block import BlockBatch, block_window_forward

BLOCK_SPECS = BlockBatch(
    det_feat=P("data", None), det_label=P("data"), det_step=P("data"),
    active_idx=P("data", None), newdet_idx=P("data", None),
    blk_na=P("data"), blk_nt=P("data"), blk_edge_base=P("data"),
    edge_label=P("data", None, None), step_valid=P(None, "data"),
)


def _rebase(bb: BlockBatch, axis_name: str) -> BlockBatch:
    """Global window-major detection ids -> shard-local ids."""
    b_local = bb.step_valid.shape[1]
    cap_d = bb.det_feat.shape[0] // b_local
    off = jax.lax.axis_index(axis_name) * b_local * cap_d
    return bb._replace(active_idx=bb.active_idx - off,
                       newdet_idx=bb.newdet_idx - off)


def make_sharded_block_step(mesh: Mesh, cfg: mpnn.ModelConfig, tx,
                            tp_classifier: bool, compute_dtype=None,
                            fused: bool = False, remat=None,
                            axis_name: str = "data",
                            defer_loss: bool = False):
    """jit'd SPMD train step over `mesh` consuming a global BlockBatch.

    Windows (B = step_valid.shape[1]) must divide by the 'data' axis size.
    Params/optimizer state are replicated; returns the same
    (params, stats, opt_state, loss, aux) contract as the single-device
    block step, with loss = mean-per-window over the GLOBAL batch.
    remat=None resolves like make_block_train_step (off for fused).
    """
    if remat is None:
        remat = not fused
    repl = P()

    def local_loss(params, batch_stats, bb_g: BlockBatch, rng):
        bb = _rebase(bb_g, axis_name)
        if rng is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        b_local = bb.step_valid.shape[1]
        total, aux = block_window_forward(
            params, batch_stats, cfg, bb, tp_classifier, train=True,
            remat=remat, compute_dtype=compute_dtype, rng=rng, fused=fused,
            axis_name=axis_name, defer_loss=defer_loss)
        # local per-window means -> global sums; the caller divides by B
        sums = jax.lax.psum(
            jnp.stack([total, aux["loss_ce"], aux["loss_f"]]) * b_local,
            axis_name)
        counts = jax.lax.psum(
            jnp.stack([aux["tp"], aux["fp"], aux["fn"]]), axis_name)
        n_windows = jax.lax.psum(jnp.int32(b_local), axis_name)
        return sums[0] / n_windows, {
            "loss_ce": sums[1] / n_windows, "loss_f": sums[2] / n_windows,
            "tp": counts[0], "fp": counts[1], "fn": counts[2],
            # sync-BN: every shard computed identical pooled statistics
            "batch_stats": aux["batch_stats"],
        }

    def _make(with_rng: bool):
        def body(params, batch_stats, bb, *maybe_rng):
            rng = maybe_rng[0] if maybe_rng else None
            return local_loss(params, batch_stats, bb, rng)

        in_specs = (repl, repl, BLOCK_SPECS) + ((repl,) if with_rng else ())
        # check_vma stays ON: it is what makes the transpose of the
        # replicated-params broadcast insert the cross-shard gradient psum
        # (with it off, grads silently come back per-shard).
        sharded = shard_map(body, mesh=mesh, in_specs=in_specs,
                            out_specs=(repl, repl))

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, batch_stats, opt_state, bb: BlockBatch, *maybe_rng):
            def loss_fn(p, s):
                return sharded(p, s, bb, *maybe_rng)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            params, updates)
            return params, aux["batch_stats"], opt_state, loss, {
                k: aux[k] for k in ("loss_ce", "loss_f", "tp", "fp", "fn")
            }

        return step

    steps = {}

    def run(params, batch_stats, opt_state, bb: BlockBatch, rng=None):
        b = bb.step_valid.shape[1]
        ndata = mesh.shape[axis_name]
        if b % ndata != 0:
            raise ValueError(f"batch windows {b} must divide by "
                             f"'{axis_name}' axis size {ndata}")
        with_rng = rng is not None
        if with_rng not in steps:
            steps[with_rng] = _make(with_rng)
        extra = (rng,) if with_rng else ()
        return steps[with_rng](params, batch_stats, opt_state, bb, *extra)

    return run
