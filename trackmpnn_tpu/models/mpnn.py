"""TrackMPNN: multi-branch recurrent message-passing network, TPU-native.

Functional re-design of the reference model (/root/reference/models/
track_mpnn.py, models/layers.py).  Behavioral spec reproduced exactly:

  * per-feature-branch input MLP (Linear-BN-ReLU-Linear) applied to the rows
    introduced this step - including zero-feature edge rows, which therefore
    participate in BatchNorm statistics (track_mpnn.py:58-61);
  * new edge rows start with zero hidden state (the I_node mask there);
  * one FactorGraphGRU round per step: edge rows update from the difference
    (msg 'diff') or concat (msg 'concat') of their endpoints' hiddens via an
    edge-GRU; detection rows update from the signed sum (or GAT-attention-
    weighted sum) of incident edge hiddens via a node-GRU (layers.py:84-116);
  * biased output heads: detections +4.595 prior, edges -4.595
    (track_mpnn.py:35-43); model returns sigmoid probs, logits, hidden state,
    attention - as a structured output so every caller agrees on arity
    (the reference's forward returns 4 values but most callers unpack 3,
    a latent crash documented in SURVEY.md 3.4).

All adjacency algebra is gathers + masked segment sums (see graph/view.py);
the hot loop contains no dynamic shapes, so the whole rolling window jits
into a single XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from trackmpnn_tpu.graph.view import GraphView
from trackmpnn_tpu.models import nn
from trackmpnn_tpu.ops import segment_softmax, segment_sum

LEAKY_ALPHA = 0.2
ATT_DROPOUT = 0.5
HEAD_BIAS = 4.595  # sigmoid prior ~0.99 for detections, ~0.01 for edges

# feature-branch slicing: (name, width) in concatenation order; widths for
# '2d' depend on the number of categories (one-hot) + [score, xc, yc, w, h].
def branch_widths(features: str, ncategories: int, num_vis_feats: int = 128):
    widths = []
    if "2d" in features:
        widths.append(("2d", ncategories + 5))
    if "temp" in features:
        widths.append(("temp", 2))
    if "vis" in features:
        widths.append(("vis", num_vis_feats))
    if not widths:
        raise ValueError(f"no recognized feature branches in {features!r}")
    return widths


class ModelConfig(NamedTuple):
    features: str = "2d"
    ncategories: int = 3
    nhidden: int = 64
    nattheads: int = 0
    msg_type: str = "diff"  # 'diff' | 'concat'
    num_vis_feats: int = 128

    @property
    def branches(self):
        return branch_widths(self.features, self.ncategories, self.num_vis_feats)

    @property
    def nfeatures(self):
        return sum(w for _, w in self.branches)


class ModelOutput(NamedTuple):
    scores: jnp.ndarray          # f32[N]  sigmoid(logits)
    logits: jnp.ndarray          # f32[N]
    hidden: jnp.ndarray          # f32[N, nbranches*nhidden]
    attention: Optional[tuple]   # per-branch attention (or None)


def init_params(key, cfg: ModelConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.branches) * 3 + 2)
    ki = iter(keys)
    branches = []
    for _, width in cfg.branches:
        b = {
            "input": nn.input_transform_init(next(ki), width, cfg.nhidden, dtype),
            "edge_gru": nn.gru_init(
                next(ki),
                2 * cfg.nhidden if cfg.msg_type == "concat" else cfg.nhidden,
                cfg.nhidden,
                dtype=dtype,
            ),
            "node_gru": nn.gru_init(next(ki), cfg.nhidden, cfg.nhidden, dtype=dtype),
        }
        if cfg.nattheads > 0:
            gat_keys = jax.random.split(jax.random.fold_in(keys[-1], len(branches)), cfg.nattheads * 2)
            b["gat"] = [
                {
                    "W_att": nn.xavier_uniform(gat_keys[2 * h], (cfg.nhidden, cfg.nhidden), gain=1.414, dtype=dtype),
                    "a": nn.xavier_uniform(gat_keys[2 * h + 1], (cfg.nhidden, 1), gain=1.414, dtype=dtype),
                }
                for h in range(cfg.nattheads)
            ]
        branches.append(b)
    nb = len(cfg.branches)
    out_node = nn.linear_init(next(ki), nb * cfg.nhidden, 1, b_val=+HEAD_BIAS, dtype=dtype)
    out_edge = nn.linear_init(next(ki), nb * cfg.nhidden, 1, b_val=-HEAD_BIAS, dtype=dtype)
    return {"branches": branches, "out_node": out_node, "out_edge": out_edge}


def init_batch_stats(cfg: ModelConfig, dtype=jnp.float32):
    return {"branches": [{"bn": nn.batchnorm_stats_init(cfg.nhidden, dtype)} for _ in cfg.branches]}


# ----------------------------------------------------------- message ops ----
def _node_support(h, g: GraphView, msg_type: str):
    """node_adj_norm @ h without the matrix: per edge row, h[past] (-/|) h[fut].

    'diff' mode routes through the differentiable gather-diff dispatch
    (XLA by default; the experimental TM_PALLAS=1 kernel keeps h
    VMEM-resident but serializes under vmap - see ops/pallas_mp.py).
    The production fast path avoids this row-layout gather entirely via
    block-structured reductions (train/block.py)."""
    if msg_type == "concat":
        e = g.edge_mask()[:, None]
        return jnp.where(e, jnp.concatenate([h[g.past], h[g.fut]], axis=-1), 0.0)
    from trackmpnn_tpu.ops.pallas_mp import gather_diff

    return gather_diff(h, g.past, g.fut, g.edge_mask())


def _edge_support(h, g: GraphView):
    """edge_adj_norm @ h: det row d gets sum_{past(e)=d} h[e] - sum_{fut(e)=d} h[e].

    Routed through the differentiable signed-segment-sum dispatch, which
    runs the Pallas VMEM-resident scatter kernel under TM_PALLAS=1."""
    from trackmpnn_tpu.ops.pallas_mp import signed_segment_sum

    return signed_segment_sum(h, g.past, g.fut, g.edge_mask(), g.capacity)


def _gat_head(params, h, g: GraphView, drop_rng, train: bool):
    """One GraphAttentionLayer head (ref layers.py:7-46), index-form.

    Per-edge scalar score from |h_att[past] - h_att[fut]| @ a; per-detection
    softmax over incident edges (each edge appears in both endpoints'
    neighborhoods, with sign edge_adj[d, e] = +1 past / -1 future); optional
    dropout p=0.5 on attention weights at train time.
    """
    n = g.capacity
    em = g.edge_mask()
    h_att = h @ params["W_att"]
    a_in = jnp.where(em[:, None], jnp.abs(h_att[g.past] - h_att[g.fut]), 0.0)
    e_score = jax.nn.leaky_relu(a_in @ params["a"], LEAKY_ALPHA)[:, 0]  # [N]

    # doubled incidence: entry k<N is (past[k] <- +e_k), k>=N is (fut[k] <- -e_k)
    seg = jnp.concatenate([g.past, g.fut])
    val = jnp.concatenate([e_score, e_score])
    mask2 = jnp.concatenate([em, em])
    att = segment_softmax(val, seg, n, mask=mask2)  # [2N]
    if train:
        keep = jax.random.bernoulli(drop_rng, 1.0 - ATT_DROPOUT, att.shape)
        att = att * keep / (1.0 - ATT_DROPOUT)
    sign = jnp.concatenate([jnp.ones(n), -jnp.ones(n)])
    h2 = jnp.concatenate([h, h], axis=0)
    h_prime = segment_sum(h2 * (att * sign)[:, None], seg, n, mask=mask2)
    return h_prime, att


def _factor_graph_gru(params, h, g: GraphView, msg_type, nattheads, drop_rng, train):
    """FactorGraphGRU round (ref layers.py:84-116): edge-GRU then node-GRU."""
    ns = _node_support(h, g, msg_type)
    edge_out = nn.gru_cell(params["edge_gru"], ns, h)

    attention = None
    if nattheads > 0:
        acc = None
        atts = []
        for i in range(nattheads):
            rng_i = jax.random.fold_in(drop_rng, i) if drop_rng is not None else None
            hp, att = _gat_head(params["gat"][i], h, g, rng_i, train)
            acc = hp if acc is None else acc + hp
            atts.append(att)
        edge_support = acc / nattheads
        attention = tuple(atts)
    else:
        edge_support = _edge_support(h, g)
    node_out = nn.gru_cell(params["node_gru"], edge_support, h)

    out = jnp.where(g.is_det[:, None], node_out, edge_out)
    return jnp.where(g.live[:, None], out, 0.0), attention


# --------------------------------------------------------------- forward ----
def forward(
    params,
    batch_stats,
    cfg: ModelConfig,
    g: GraphView,
    h_prev: Optional[jnp.ndarray],
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
):
    """One message-passing round over the live window.

    h_prev: f32[N, nbranches*nhidden] hidden state from the previous round
    (rows for slots not yet live are ignored), or None on the first round.

    Returns (ModelOutput, new_batch_stats).
    """
    n = g.capacity
    H = cfg.nhidden
    nb = len(cfg.branches)
    if h_prev is None:
        h_prev = jnp.zeros((n, nb * H), jnp.float32)

    has_new = jnp.any(g.new)
    new_det = g.new & g.is_det

    hs = []
    new_stats_branches = []
    off = 0
    for bi, (_, width) in enumerate(cfg.branches):
        bp = params["branches"][bi]
        bs = batch_stats["branches"][bi]["bn"]
        x = g.feat[:, off : off + width]
        off += width
        xt, bn_stats = nn.input_transform(bp["input"], bs, x, g.new, train=train)
        # if no rows were introduced this step, torch never runs BN: keep stats
        bn_stats = jax.tree_util.tree_map(
            lambda new_s, old_s: jnp.where(has_new, new_s, old_s), bn_stats, bs
        )
        new_stats_branches.append({"bn": bn_stats})
        h_b = h_prev[:, bi * H : (bi + 1) * H]
        # new detection rows take the transformed input; new edge rows start at 0
        h_b = jnp.where(new_det[:, None], xt, jnp.where(g.new[:, None], 0.0, h_b))
        h_b = jnp.where(g.live[:, None], h_b, 0.0)
        hs.append(h_b)

    outs = []
    atts = []
    for bi in range(nb):
        rng_b = jax.random.fold_in(rng, bi) if rng is not None else None
        out_b, att_b = _factor_graph_gru(
            params["branches"][bi], hs[bi], g, cfg.msg_type, cfg.nattheads, rng_b, train
        )
        outs.append(out_b)
        atts.append(att_b)

    h_out = jnp.concatenate(outs, axis=-1)
    y_node = nn.linear(params["out_node"], h_out)[:, 0]
    y_edge = nn.linear(params["out_edge"], h_out)[:, 0]
    logits = jnp.where(g.is_det, y_node, y_edge)
    logits = jnp.where(g.live, logits, 0.0)
    scores = jax.nn.sigmoid(logits)

    out = ModelOutput(
        scores=jnp.where(g.live, scores, 0.0),
        logits=logits,
        hidden=h_out,
        attention=tuple(atts) if cfg.nattheads > 0 else None,
    )
    return out, {"branches": new_stats_branches}
