"""Loss parity: device segment-op losses vs dense numpy oracles.

Oracles implement the spec (SURVEY.md; ref models/loss.py behavior):
targets pick latest/earliest positive incident edges; CE is per-detection
softmax over incident edge sets scaled by 1/|set|; focal(g=0) is BCE with
eps inside the log.
"""

import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.graph import engine, schedule
from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.losses import bce_loss, ce_loss, make_targets


def build_live_graph(num_frames=6, seed=7):
    feats, bbox_pred, _ = make_sequence(num_tracks=5, num_frames=num_frames, seed=seed)
    y = bbox_pred[:, :2].astype(np.int64)
    ws = schedule.build_window_schedule(feats, y, bucket=64)
    assert ws is not None
    return ws


def oracle_targets(label, is_det, past, fut, live):
    n = len(label)
    tgt = np.zeros(n, np.int64)
    for d in range(n):
        if live[d] and is_det[d]:
            tgt[d] = label[d]
    for d in range(n):
        if not (live[d] and is_det[d]):
            continue
        past_set = [e for e in range(n) if live[e] and not is_det[e] and fut[e] == d]
        pos = [e for e in past_set if label[e] == 1]
        if pos:
            tgt[max(pos)] = 1
        fut_set = [e for e in range(n) if live[e] and not is_det[e] and past[e] == d]
        pos = [e for e in fut_set if label[e] == 1]
        if pos:
            tgt[min(pos)] = 1
    return tgt


def oracle_ce(logits, targets, is_det, past, fut, live):
    n = len(logits)
    total = 0.0
    for d in range(n):
        if not (live[d] and is_det[d]):
            continue
        for side, pick in (("past", max), ("fut", min)):
            if side == "past":
                es = [e for e in range(n) if live[e] and not is_det[e] and fut[e] == d]
            else:
                es = [e for e in range(n) if live[e] and not is_det[e] and past[e] == d]
            if not es:
                continue
            pos = [e for e in es if targets[e] == 1]
            if not pos:
                continue
            sel = pick(pos)
            l = np.array([logits[e] for e in es], np.float64)
            lse = np.log(np.sum(np.exp(l - l.max()))) + l.max()
            total += (lse - logits[sel]) / len(es)
    return total


def slot_arrays(ws, step):
    n_a = ws.n_after[step]
    cap = len(ws.is_det)
    live = np.arange(cap) < n_a
    return ws.is_det, ws.past, ws.fut, live


def test_targets_match_oracle():
    ws = build_live_graph()
    for step in range(ws.n_steps):
        is_det, past, fut, live = slot_arrays(ws, step)
        got = np.asarray(
            make_targets(jnp.asarray(ws.label), jnp.asarray(is_det),
                         jnp.asarray(past), jnp.asarray(fut), jnp.asarray(live))
        )
        want = oracle_targets(ws.label, is_det, past, fut, live)
        np.testing.assert_array_equal(got[live], want[live])


def test_ce_matches_oracle(rng):
    ws = build_live_graph()
    cap = len(ws.is_det)
    logits = rng.normal(size=cap).astype(np.float32) * 2
    for step in [0, ws.n_steps // 2, ws.n_steps - 1]:
        is_det, past, fut, live = slot_arrays(ws, step)
        tgt = oracle_targets(ws.label, is_det, past, fut, live)
        got = float(
            ce_loss(jnp.asarray(logits), jnp.asarray(tgt.astype(np.int32)),
                    jnp.asarray(is_det), jnp.asarray(past), jnp.asarray(fut),
                    jnp.asarray(live))
        )
        want = oracle_ce(logits, tgt, is_det, past, fut, live)
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bce_matches_torch(rng):
    import torch

    n = 64
    p = rng.uniform(0.01, 0.99, n).astype(np.float32)
    t = (rng.random(n) > 0.5).astype(np.int64)
    mask = rng.random(n) > 0.3
    got = float(bce_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask)))
    # reference focal(gamma=0): -mean(log(pt + 1e-10)) over the selected rows
    pm, tm = torch.tensor(p[mask]), torch.tensor(t[mask])
    pt = torch.where(tm == 1, pm, 1 - pm)
    want = float(-(torch.log(pt + 1e-10)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
