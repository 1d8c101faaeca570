"""Appearance-embedding losses for joint backbone training.

FairMOT-style identity classification (ref models/loss.py:162-181): track
ids in the chunk map to class indices modulo the embedding width; false
positives become ignore targets.  Also the discriminative EmbeddingLoss
(pull-to-cluster-mean / push-cluster-means, ref loss.py:118-159 - dead code
in the reference, kept here as an optional alternative).

Both take fixed-shape padded inputs with masks so they sit inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trackmpnn_tpu.ops import segment_sum


def fairmot_id_loss(features, track_ids, valid, num_classes: int):
    """Cross-entropy of embedding logits against (track_id % num_classes).

    features: f32[N, num_classes] raw logits; track_ids: int32[N] (-1 = FP);
    valid: bool[N].  FPs and padding are ignored (torch ignore_index=-100
    semantics, ref loss.py:176-181); mean over counted rows.
    """
    counted = valid & (track_ids >= 0)
    cls = jnp.where(counted, track_ids % num_classes, 0)
    logp = jax.nn.log_softmax(features, axis=-1)
    nll = -jnp.take_along_axis(logp, cls[:, None], axis=1)[:, 0]
    n = jnp.maximum(jnp.sum(counted), 1)
    return jnp.sum(jnp.where(counted, nll, 0.0)) / n


def discriminative_embedding_loss(features, track_ids, valid, max_clusters: int,
                                  delta_var: float = 0.5, delta_dist: float = 10.0):
    """Variance (pull) + distance (push) terms over per-track cluster means
    (ref loss.py:118-159).  track ids are bucketed by id % max_clusters."""
    tp = valid & (track_ids >= 0)
    seg = jnp.where(tp, track_ids % max_clusters, max_clusters)
    n = features.shape[0]
    ones = jnp.ones(n, jnp.float32)
    counts = segment_sum(ones, seg, max_clusters, mask=tp)
    sums = segment_sum(features, seg, max_clusters, mask=tp)
    present = counts > 0
    means = sums / jnp.maximum(counts, 1.0)[:, None]

    # pull: mean over clusters of mean-over-members relu(||f - mu|| - dv)^2
    mu_of = means[jnp.clip(seg, 0, max_clusters - 1)]
    d = jnp.linalg.norm(features - mu_of, axis=1)
    per_row = jax.nn.relu(d - delta_var) ** 2
    per_cluster = segment_sum(per_row, seg, max_clusters, mask=tp) / jnp.maximum(counts, 1.0)
    n_clusters = jnp.maximum(jnp.sum(present), 1)
    var_loss = jnp.sum(jnp.where(present, per_cluster, 0.0)) / n_clusters

    # push: pairwise relu(dd - ||mu_i - mu_j||)^2 over distinct present pairs
    diff = means[:, None, :] - means[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-12)
    pair = present[:, None] & present[None, :] & ~jnp.eye(max_clusters, dtype=bool)
    push = jax.nn.relu(delta_dist - dist) ** 2
    n_pairs = jnp.maximum(jnp.sum(pair), 1)
    c = jnp.sum(present)
    dist_loss = jnp.where(c > 1, jnp.sum(jnp.where(pair, push, 0.0)) / n_pairs, 0.0)
    return var_loss + dist_loss
