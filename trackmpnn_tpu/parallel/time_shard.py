"""Time-axis partitioning of the rolling window with halo-only exchange.

Training slots are appended in time order (graph/engine.py), so a
contiguous block-sharding of the slot axis IS a partition of the window
along time.  Message passing touches remote state in exactly two ways:

  * an edge row reads the hidden state of its two detection endpoints
    (ref layers.py:95: node_adj @ h), and
  * a detection row accumulates the hidden states of its incident edges
    (ref layers.py:103: edge_adj @ h).

Both reference only rows that CROSS a shard cut - known host-side from
the schedule's past/fut arrays.  `build_halo_plan` precomputes, per shard,
the union of its rows any other shard references; on device one
boundary-sized `all_gather` moves those rows forward (hidden halo fetch)
and one boundary-sized `all_to_all` moves per-row partial aggregates back
(scatter return).  Communication per round is O(boundary), not O(window):
the previous revision all-gathered the full window's hidden state and
psum'd full-window buckets, which defeats time-sharding at large windows.

Local compute between issuing the fetch and consuming it (input MLP,
interior aggregation) is dataflow-independent of the collective, so XLA's
latency-hiding scheduler can overlap the ICI transfer with VPU/MXU work.

Covers both 'diff'/'concat' messaging and GAT attention heads (the
per-detection softmax runs as local partial max/sum + halo return +
halo fetch of the per-detection statistics).  Equality with the
unsharded model at 2/4/8 shards is pinned in tests/test_time_shard.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from trackmpnn_tpu.models import mpnn, nn
from trackmpnn_tpu.ops import segment_max, segment_sum

_NEG_LARGE = -1e30


# ================================================================ plan ====
@dataclass
class HaloPlan:
    """Static exchange plan for one window layout (cap rows, P shards).

    Each shard q publishes ONE list: the union of its rows referenced by
    any other shard's edges.  The same active-track rows are typically
    needed by every downstream shard, so the union is far smaller than
    per-pair lists - one boundary-sized `all_gather` serves all consumers,
    and the reverse aggregation is one boundary-sized `all_to_all`.

    Extended-frame convention on shard p: rows [0, blk) are p's local
    slots; remote slot (q, k) - the k-th row of q's union - lives at
    blk + q*u_cap + k.  `past_ext`/`fut_ext` are per-slot endpoint indices
    rewritten into the owning shard's extended frame, so every gather/
    segment-op on device is purely local."""

    n_shards: int
    blk: int
    u_cap: int
    send_idx: np.ndarray    # int32 [P, u_cap]: [q, k] = LOCAL row q publishes
    send_valid: np.ndarray  # bool  [P, u_cap]
    past_ext: np.ndarray    # int32 [cap]
    fut_ext: np.ndarray     # int32 [cap]
    comm_rows: int          # true (unpadded) halo rows per fetch

    @property
    def ext_rows(self) -> int:
        return self.blk + self.n_shards * self.u_cap

    def comm_bytes_per_round(self, h_width: int, dtype_bytes: int = 4) -> int:
        """Wire bytes received per shard for one fetch + one return of an
        [*, h_width] state (padded slots included, i.e. what moves)."""
        per_dir = (self.n_shards - 1) * self.u_cap * h_width * dtype_bytes
        return 2 * per_dir


def build_halo_plan(is_det: np.ndarray, past: np.ndarray, fut: np.ndarray,
                    n_shards: int, pad_to: int = 8) -> HaloPlan:
    """Derive the boundary-exchange lists from a window's slot layout.

    Endpoint arrays use the schedule convention: non-edge rows carry their
    own index (inert).  Rows are owned block-contiguously: owner(r) =
    r // (cap / n_shards)."""
    cap = int(len(is_det))
    if cap % n_shards:
        raise ValueError(f"cap {cap} not divisible by {n_shards} shards")
    blk = cap // n_shards
    idx = np.arange(cap)
    owner = idx // blk
    is_edge = past != idx  # true edges only (padding rows are self-linked)

    # union[q] = sorted rows owned by q that any other shard's edges reference
    union = [set() for _ in range(n_shards)]
    for ends in (past, fut):
        e_own = owner[is_edge]
        r = ends[is_edge]
        cross = owner[r] != e_own
        for row in r[cross]:
            union[owner[row]].add(int(row))
    lists = [sorted(u) for u in union]
    comm_rows = sum(len(l) for l in lists)
    longest = max((len(l) for l in lists), default=0)
    u_cap = max(pad_to, ((longest + pad_to - 1) // pad_to) * pad_to)

    send_idx = np.zeros((n_shards, u_cap), np.int32)
    send_valid = np.zeros((n_shards, u_cap), bool)
    ext_pos = {}  # global row r -> slot in every consumer's extended frame
    for q in range(n_shards):
        for k, r in enumerate(lists[q]):
            send_idx[q, k] = r - q * blk
            send_valid[q, k] = True
            ext_pos[r] = blk + q * u_cap + k

    past_ext = (idx % blk).astype(np.int32)
    fut_ext = past_ext.copy()
    for out, ends in ((past_ext, past), (fut_ext, fut)):
        for e in idx[is_edge]:
            r = int(ends[e])
            out[e] = (r - int(owner[e]) * blk) if owner[r] == owner[e] else ext_pos[r]

    return HaloPlan(n_shards=n_shards, blk=blk, u_cap=u_cap,
                    send_idx=send_idx, send_valid=send_valid,
                    past_ext=past_ext, fut_ext=fut_ext, comm_rows=comm_rows)


# ======================================================== device halo ====
def _halo_fetch(x_local, send_idx, send_valid, axis_name):
    """[blk, ...] -> [blk + P*u_cap, ...] extended frame.

    send_idx/send_valid are this shard's [u_cap] union list.  One
    boundary-sized all_gather serves every consumer; invalid padding
    slots carry zeros."""
    buf = x_local[send_idx]  # [u_cap, ...]
    buf = jnp.where(send_valid.reshape(send_valid.shape + (1,) * (buf.ndim - 1)),
                    buf, 0.0)
    recv = jax.lax.all_gather(buf, axis_name)  # [P, u_cap, ...]
    return jnp.concatenate(
        [x_local, recv.reshape((-1,) + recv.shape[2:])], axis=0)


def _halo_return(local_part, ext_tail, send_idx, send_valid, axis_name,
                 combine: str = "add"):
    """Route the remote tail of an extended aggregate back to row owners.

    ext_tail: [P*u_cap, ...] partial aggregates addressed to remote rows
    (slot (q, k) belongs to the k-th row of q's union).  One all_to_all
    delivers each shard the P partials for its own union rows, combined
    locally - comm is boundary-sized in both directions."""
    u_cap = send_idx.shape[0]
    tail = ext_tail.reshape((-1, u_cap) + ext_tail.shape[1:])  # [P, u_cap, ...]
    recv = jax.lax.all_to_all(tail, axis_name, 0, 0)           # [P, u_cap, ...]
    blk = local_part.shape[0]
    if combine == "add":
        comb = jnp.sum(recv, axis=0)
        return local_part + segment_sum(comb, send_idx, blk, mask=send_valid)
    if combine == "max":
        comb = jnp.max(recv, axis=0)
        return jnp.maximum(local_part,
                           segment_max(comb, send_idx, blk, mask=send_valid))
    raise ValueError(combine)



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


# ============================================================= forward ====
def _gat_head_sharded(params, h_b, h_ext, local, halo, axis_name,
                      drop_mask, blk):
    """One GraphAttentionLayer head under time sharding.

    Mirrors models/mpnn.py:_gat_head: per-edge score from the halo'd
    endpoint hiddens, per-detection softmax assembled from local partials
    (max, then sum) with one halo return + fetch each, then the signed
    attention-weighted aggregation returns along the same routes."""
    em = local["edge_mask"]
    send_idx, send_valid = halo
    pe, fe = local["past_ext"], local["fut_ext"]

    h_att_ext = h_ext @ params["W_att"]
    a_in = jnp.where(em[:, None], jnp.abs(h_att_ext[pe] - h_att_ext[fe]), 0.0)
    e_score = jax.nn.leaky_relu(a_in @ params["a"],
                                mpnn.LEAKY_ALPHA)[:, 0]  # [blk]

    E = h_ext.shape[0]
    seg2 = jnp.concatenate([pe, fe])
    val2 = jnp.concatenate([e_score, e_score])
    em2 = jnp.concatenate([em, em])

    # per-detection max: local partial over the extended frame, remote
    # tail returned to owners, owners' totals fetched back to the edges
    m_ext = segment_max(val2, seg2, E, mask=em2)
    m_loc = _halo_return(m_ext[:blk], m_ext[blk:], send_idx, send_valid,
                         axis_name, combine="max")
    m_all = _halo_fetch(m_loc, send_idx, send_valid, axis_name)
    safe_m = jnp.where(m_all > _NEG_LARGE / 2, m_all, 0.0)
    ex = jnp.where(em2, jnp.exp(val2 - safe_m[seg2]), 0.0)

    s_ext = segment_sum(ex, seg2, E, mask=em2)
    s_loc = _halo_return(s_ext[:blk], s_ext[blk:], send_idx, send_valid,
                         axis_name, combine="add")
    s_all = _halo_fetch(s_loc, send_idx, send_valid, axis_name)
    att = ex / jnp.maximum(s_all[seg2], 1e-30)
    if drop_mask is not None:
        att = att * drop_mask / (1.0 - mpnn.ATT_DROPOUT)

    sign = jnp.concatenate([jnp.ones(blk), -jnp.ones(blk)])
    h2 = jnp.concatenate([h_b, h_b], axis=0)
    hp_ext = segment_sum(h2 * (att * sign)[:, None], seg2, E, mask=em2)
    h_prime = _halo_return(hp_ext[:blk], hp_ext[blk:], send_idx, send_valid,
                           axis_name, combine="add")
    return h_prime, att.reshape(2, blk)


def forward_time_sharded(params, batch_stats, cfg, local, h_local, axis_name,
                         drop_masks=None):
    """One MPN round on this shard's rows with halo-only exchange.

    `local` holds this shard's slices: is_det/live/new [blk] bool,
    past_ext/fut_ext [blk] extended-frame endpoint indices, feat [blk, F],
    send_idx/send_valid [P, cap_pair] exchange lists.  h_local:
    [blk, nb*H].  drop_masks: optional [nb][heads] of [2*blk] keep masks
    (replicated-rng GAT attention dropout).  Returns (scores, logits,
    h_out, att, new_stats) - att is [nb?, heads, 2, blk] or None."""
    H = cfg.nhidden
    edge_mask = local["live"] & ~local["is_det"]
    new_det = local["new"] & local["is_det"]
    has_new = jax.lax.psum(jnp.sum(local["new"].astype(jnp.int32)), axis_name) > 0
    halo = (local["send_idx"], local["send_valid"])
    blk = local["is_det"].shape[0]
    loc = dict(local, edge_mask=edge_mask)

    outs, atts, stats_out = [], [], []
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

        # halo fetch issued early; interior aggregation below is dataflow-
        # independent so the transfer overlaps local compute
        h_ext = _halo_fetch(h_b, *halo, axis_name)

        pe, fe = local["past_ext"], local["fut_ext"]
        if cfg.msg_type == "concat":
            ns = jnp.where(edge_mask[:, None],
                           jnp.concatenate([h_ext[pe], h_ext[fe]], axis=-1), 0.0)
        else:
            ns = jnp.where(edge_mask[:, None], h_ext[pe] - h_ext[fe], 0.0)
        edge_out = nn.gru_cell(bp["edge_gru"], ns, h_b)

        if cfg.nattheads > 0:
            acc = None
            head_atts = []
            for hi in range(cfg.nattheads):
                dm = drop_masks[bi][hi] if drop_masks is not None else None
                hp, att = _gat_head_sharded(bp["gat"][hi], h_b, h_ext, loc,
                                            halo, axis_name, dm, blk)
                acc = hp if acc is None else acc + hp
                head_atts.append(att)
            edge_support = acc / cfg.nattheads
            atts.append(jnp.stack(head_atts))
        else:
            # signed incident-edge aggregation: local partials over the
            # extended frame, single boundary-sized return exchange
            E = h_ext.shape[0]
            pos = segment_sum(h_b, pe, E, mask=edge_mask)
            neg = segment_sum(h_b, fe, E, mask=edge_mask)
            acc_ext = pos - neg
            edge_support = _halo_return(acc_ext[:blk], acc_ext[blk:],
                                        *halo, axis_name, combine="add")

        node_out = nn.gru_cell(bp["node_gru"], edge_support, h_b)
        out_b = jnp.where(local["is_det"][:, None], node_out, edge_out)
        outs.append(jnp.where(local["live"][:, None], out_b, 0.0))

    h_out = jnp.concatenate(outs, axis=-1)
    y_node = nn.linear(params["out_node"], h_out)[:, 0]
    y_edge = nn.linear(params["out_edge"], h_out)[:, 0]
    logits = jnp.where(local["is_det"], y_node, y_edge)
    logits = jnp.where(local["live"], logits, 0.0)
    scores = jnp.where(local["live"], jax.nn.sigmoid(logits), 0.0)
    att_out = jnp.stack(atts) if atts else None
    return scores, logits, h_out, att_out, {"branches": stats_out}


# ============================================================ wrappers ====
def _plan_specs(axis_name):
    return (P(axis_name), P(axis_name), P(axis_name), P(axis_name))


def make_time_sharded_forward(mesh: Mesh, cfg, axis_name: str = "time",
                              dropout: bool = False):
    """shard_map'd single-round forward over the slot/time axis.

    Call as fwd(params, batch_stats, is_det, past_ext, fut_ext, live, new,
    feat, h, send_idx, send_valid[, drop_keep]) with the plan arrays from
    `build_halo_plan` (send_idx/send_valid get a leading shard axis;
    past_ext/fut_ext are the plan's [cap] arrays).  With dropout=True (GAT
    only) drop_keep is a bool [nb, heads, 2, cap] keep-mask — generated
    from a replicated rng host- or caller-side so sharding preserves the
    unsharded draw.  Returns full-window (scores, logits, h_out, stats)."""
    from jax import shard_map

    row = P(axis_name)
    repl = P()
    use_drop = dropout and cfg.nattheads > 0
    nb = len(cfg.branches)

    def body(params, batch_stats, is_det, past_ext, fut_ext, live, new,
             feat, h, send_idx, send_valid, *rest):
        local = {"is_det": is_det, "past_ext": past_ext, "fut_ext": fut_ext,
                 "live": live, "new": new, "feat": feat,
                 "send_idx": send_idx[0], "send_valid": send_valid[0]}
        drop_masks = None
        if use_drop:
            dk = rest[0]  # [nb, heads, 2, blk]
            drop_masks = [[dk[bi, hi].reshape(-1).astype(jnp.float32)
                           for hi in range(cfg.nattheads)] for bi in range(nb)]
        scores, logits, h_out, _, stats = forward_time_sharded(
            params, batch_stats, cfg, local, h, axis_name,
            drop_masks=drop_masks)
        return scores, logits, h_out, stats

    in_specs = [repl, repl, row, row, row, row, row, row, row,
                P(axis_name, None), P(axis_name, None)]
    if use_drop:
        in_specs.append(P(None, None, None, axis_name))
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(row, row, row, repl),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_time_sharded_window(mesh: Mesh, cfg, n_steps: int,
                             axis_name: str = "time"):
    """Full-window forward: lax.scan of the halo-exchange round over the
    schedule's teacher-forced steps (live/new masks from n_before/
    n_after), carrying hidden state.  This is the scaling unit measured
    by parallel/scaling_bench.py --time-shard."""
    from jax import shard_map

    row = P(axis_name)
    repl = P()

    def body(params, batch_stats, is_det, past_ext, fut_ext, feat,
             n_before, n_after, send_idx, send_valid):
        blk = is_det.shape[0]
        me = jax.lax.axis_index(axis_name)
        gidx = me * blk + jnp.arange(blk)
        h0 = jnp.zeros((blk, len(cfg.branches) * cfg.nhidden), jnp.float32)

        def step(carry, s):
            h, stats = carry
            live = gidx < n_after[s]
            new = (gidx >= n_before[s]) & live
            local = {"is_det": is_det, "past_ext": past_ext,
                     "fut_ext": fut_ext, "live": live, "new": new,
                     "feat": feat, "send_idx": send_idx[0],
                     "send_valid": send_valid[0]}
            _, logits, h_out, _, stats = forward_time_sharded(
                params, stats, cfg, local, h, axis_name)
            return (h_out, stats), logits

        (h, stats), logits = jax.lax.scan(step, (h0, batch_stats),
                                          jnp.arange(n_steps))
        return logits, h, stats

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, row, row, row, row, repl, repl,
                  P(axis_name, None), P(axis_name, None)),
        out_specs=(P(None, axis_name), row, repl),
        check_vma=False,
    )
    return jax.jit(sharded)
