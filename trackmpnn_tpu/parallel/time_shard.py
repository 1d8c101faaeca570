"""Explicit time-axis partitioning of the rolling window (shard_map).

Training slots are appended in time order (graph/engine.py), so a
contiguous block-sharding of the slot axis IS a partition of the window
along time: each device owns one time span's detections and association
rows.  This module implements one message-passing round with *manual*
collectives over a named mesh axis:

  1. hidden halo: edges gather their endpoints' hiddens, which may live on
     an earlier (past endpoint) shard - exchanged with `all_gather` over
     the time axis (tiled; rides ICI).  The rolling window keeps N small,
     so the full-window gather is the boundary exchange;
  2. local row-wise work: input MLP (BatchNorm statistics psum'd across
     shards so padding/masking matches the global computation), edge-GRU
     and node-GRU on the local rows only - the compute that scales 1/P;
  3. incident-edge aggregation: each shard segment-sums its local edges
     into full-window buckets, `psum` over the time axis, then slices its
     local detection rows.

The GSPMD-annotated path (parallel/data_parallel.py) lets XLA derive the
same collectives from shardings; this explicit version exists for manual
overlap control and as the reference semantics for both (tests assert
equality with the unsharded model).  Scope: 'diff' messaging (GAT heads
stay on the GSPMD path).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from trackmpnn_tpu.models import nn
from trackmpnn_tpu.ops import segment_sum


def _psum_masked_batchnorm(params, stats, x, mask, axis_name, train):
    """Masked BatchNorm1d whose batch statistics reduce across shards."""
    mask_f = mask.astype(x.dtype)[:, None]
    if not train:
        y = (x - stats["mean"]) * jax.lax.rsqrt(stats["var"] + nn.BN_EPS)
        return y * params["gamma"] + params["beta"], stats
    cnt = jax.lax.psum(jnp.sum(mask_f), axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = jax.lax.psum(jnp.sum(x * mask_f, axis=0), axis_name) / cnt
    var_b = jax.lax.psum(jnp.sum(((x - mean) ** 2) * mask_f, axis=0), axis_name) / cnt
    y = (x - mean) * jax.lax.rsqrt(var_b + nn.BN_EPS)
    var_u = var_b * cnt / jnp.maximum(cnt - 1.0, 1.0)
    new_stats = {
        "mean": (1 - nn.BN_MOMENTUM) * stats["mean"] + nn.BN_MOMENTUM * mean,
        "var": (1 - nn.BN_MOMENTUM) * stats["var"] + nn.BN_MOMENTUM * var_u,
    }
    return y * params["gamma"] + params["beta"], new_stats


def forward_time_sharded(params, batch_stats, cfg, local, h_local, axis_name):
    """One MPN round on this shard's rows.  `local` is a dict of this
    shard's slot arrays with GLOBAL index values in past/fut:
      is_det[b], past[b], fut[b], live[b], new[b], feat[b, F]
    h_local: [blk, nb*H].  Returns (scores, logits, h_out) local rows and
    updated batch stats (replicated)."""
    blk = local["is_det"].shape[0]
    H = cfg.nhidden
    nb = len(cfg.branches)
    edge_mask = local["live"] & ~local["is_det"]
    new_det = local["new"] & local["is_det"]
    has_new = jax.lax.psum(jnp.sum(local["new"].astype(jnp.int32)), axis_name) > 0
    n_global = blk * jax.lax.psum(1, axis_name)

    outs = []
    stats_out = []
    for bi, (_, width) in enumerate(cfg.branches):
        bp = params["branches"][bi]
        bs = batch_stats["branches"][bi]["bn"]
        off = sum(w for _, w in cfg.branches[:bi])
        x = local["feat"][:, off : off + width]

        y = nn.linear(bp["input"]["lin1"], x)
        y, bn_stats = _psum_masked_batchnorm(bp["input"]["bn"], bs, y,
                                             local["new"], axis_name, True)
        bn_stats = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_new, a, b), bn_stats, bs)
        stats_out.append({"bn": bn_stats})
        xt = nn.linear(bp["input"]["lin2"], jax.nn.relu(y))

        h_b = h_local[:, bi * H : (bi + 1) * H]
        h_b = jnp.where(new_det[:, None], xt, jnp.where(local["new"][:, None], 0.0, h_b))
        h_b = jnp.where(local["live"][:, None], h_b, 0.0)

        # halo exchange: full-window hidden over the time axis
        h_full = jax.lax.all_gather(h_b, axis_name, tiled=True)  # [N, H]

        ns = jnp.where(edge_mask[:, None],
                       h_full[local["past"]] - h_full[local["fut"]], 0.0)
        edge_out = nn.gru_cell(bp["edge_gru"], ns, h_b)

        # local partial signed segment-sum into global buckets, then psum
        pos = segment_sum(h_b, local["past"], n_global, mask=edge_mask)
        neg = segment_sum(h_b, local["fut"], n_global, mask=edge_mask)
        es_global = jax.lax.psum(pos - neg, axis_name)
        shard = jax.lax.axis_index(axis_name)
        es_local = jax.lax.dynamic_slice_in_dim(es_global, shard * blk, blk, axis=0)

        node_out = nn.gru_cell(bp["node_gru"], es_local, h_b)
        out_b = jnp.where(local["is_det"][:, None], node_out, edge_out)
        outs.append(jnp.where(local["live"][:, None], out_b, 0.0))

    h_out = jnp.concatenate(outs, axis=-1)
    y_node = nn.linear(params["out_node"], h_out)[:, 0]
    y_edge = nn.linear(params["out_edge"], h_out)[:, 0]
    logits = jnp.where(local["is_det"], y_node, y_edge)
    logits = jnp.where(local["live"], logits, 0.0)
    return jnp.where(local["live"], jax.nn.sigmoid(logits), 0.0), logits, h_out, \
        {"branches": stats_out}


def make_time_sharded_forward(mesh: Mesh, cfg, axis_name: str = "time"):
    """shard_map'd single-round forward over the slot/time axis.

    Inputs: full-window arrays is_det/past/fut/live/new [N], feat [N, F],
    h [N, nb*H]; N must divide by the axis size.  Returns full-window
    (scores, logits, h_out) gathered back, for parity testing and as the
    building block of a manually-scheduled scan."""
    from jax import shard_map

    spec_row = P(axis_name)
    repl = P()

    def body(params, batch_stats, is_det, past, fut, live, new, feat, h):
        local = {"is_det": is_det, "past": past, "fut": fut,
                 "live": live, "new": new, "feat": feat}
        scores, logits, h_out, stats = forward_time_sharded(
            params, batch_stats, cfg, local, h, axis_name)
        return scores, logits, h_out, stats

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, spec_row, spec_row, spec_row, spec_row,
                  spec_row, spec_row, spec_row),
        out_specs=(spec_row, spec_row, spec_row, repl),
        check_vma=False,
    )
    return jax.jit(sharded)
