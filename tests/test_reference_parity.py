"""Ground-truth parity: run the ACTUAL reference implementation
(/root/reference, PyTorch CPU) side by side with this framework on the same
synthetic sequence with identical weights, and require `allclose`
activations, targets, and losses at every timestep of a teacher-forced
training window.  This is the BASELINE.md north-star check against the real
reference, not an oracle re-implementation.

Skipped when the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        import torch  # noqa: F401
        from models.track_mpnn import TrackMPNN as RefTrackMPNN
        from models.loss import CELoss as RefCELoss
        from models.loss import FocalLoss as RefFocalLoss
        from models.loss import create_targets as ref_create_targets
        from utils import graph as ref_graph
    finally:
        sys.path.remove(REF)
    return RefTrackMPNN, ref_graph, ref_create_targets, RefCELoss, RefFocalLoss


def torch_to_params(model, cfg):
    """Delegates to the library converter (models/convert.py)."""
    from trackmpnn_tpu.models.convert import from_state_dict

    return from_state_dict(model.state_dict(), cfg)


def reference_rollout(ref_modules, X, y, nhidden, tp_classifier=True,
                      features="2d", msg_type="diff", nattheads=0):
    """Teacher-forced training rollout through the reference's graph engine
    and model; returns per-step dense rows of (logits, targets) plus losses
    and the torch model for weight export."""
    import torch

    RefTrackMPNN, ref_graph, ref_create_targets, RefCELoss, RefFocalLoss = ref_modules
    torch.manual_seed(5)
    model = RefTrackMPNN(features=features, ncategories=3, nhidden=nhidden,
                         nattheads=nattheads, msg_type=msg_type)
    model.train()
    ce = RefCELoss()
    focal = RefFocalLoss(gamma=0)

    X_t = torch.tensor(X)[None]
    y_t = torch.tensor(y)[None]
    out = ref_graph.initialize_graph(X_t, y_t, t_st=0, mode="train", cuda=False)
    y_pred, feats, node_adj, edge_adj, labels, t_st, t_end = out
    assert y_pred is not None

    steps = []
    with torch.no_grad():
        scores, logits, states, _ = model(feats, None, node_adj, edge_adj)
        idx_node = torch.nonzero(y_pred[:, 0] != -1)[:, 0]
        idx_edge = torch.nonzero(y_pred[:, 0] == -1)[:, 0]
        targets = ref_create_targets(labels, node_adj, idx_node)
        loss_c = ce(logits, targets, node_adj, idx_node)
        loss_f = focal(scores[idx_node, 0], targets[idx_node]) + \
            focal(scores[idx_edge, 0], targets[idx_edge])
        steps.append((logits[:, 0].numpy().copy(), targets.numpy().copy(),
                      float(loss_c), float(loss_f)))
        sc2 = torch.cat((1 - scores, scores), dim=1)

        for t_cur in range(t_st, t_end):
            y_pred, feats, node_adj, edge_adj, labels = ref_graph.update_graph(
                node_adj, labels, sc2, y_pred, X_t, y_t, t_cur,
                use_hungraian=False, mode="train", cuda=False)
            scores, logits, states, _ = model(feats, states, node_adj, edge_adj)
            idx_node = torch.nonzero(y_pred[:, 0] != -1)[:, 0]
            idx_edge = torch.nonzero(y_pred[:, 0] == -1)[:, 0]
            targets = ref_create_targets(labels, node_adj, idx_node)
            loss_c = ce(logits, targets, node_adj, idx_node)
            loss_f = focal(scores[idx_node, 0], targets[idx_node]) + \
                focal(scores[idx_edge, 0], targets[idx_edge])
            steps.append((logits[:, 0].numpy().copy(), targets.numpy().copy(),
                          float(loss_c), float(loss_f)))
            sc2 = torch.cat((1 - scores, scores), dim=1)

    return model, steps


def our_rollout(params, stats, cfg, X, y):
    """Same window through our schedule + scanned forward, collecting
    per-step logits/targets/losses."""
    import jax
    import jax.numpy as jnp

    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.graph.view import GraphView
    from trackmpnn_tpu.losses import step_losses
    from trackmpnn_tpu.models import mpnn

    ws = build_window_schedule(X, y, bucket=64)
    assert ws is not None
    cap = len(ws.is_det)
    idx = np.arange(cap)
    h = None
    stats_cur = stats
    out_steps = []
    for s in range(ws.n_steps):
        live = idx < ws.n_after[s]
        new = (idx >= ws.n_before[s]) & live
        g = GraphView(is_det=jnp.asarray(ws.is_det), past=jnp.asarray(ws.past),
                      fut=jnp.asarray(ws.fut), live=jnp.asarray(live),
                      new=jnp.asarray(new), feat=jnp.asarray(ws.feat))
        out, stats_cur = mpnn.forward(params, stats_cur, cfg, g, h, train=True)
        l_ce, l_f, _, targets = step_losses(
            out.scores, out.logits, jnp.asarray(ws.label), g.is_det,
            g.past, g.fut, g.live, tp_classifier=True)
        out_steps.append((np.asarray(out.logits), np.asarray(targets),
                          float(l_ce), float(l_f), int(ws.n_after[s])))
        h = out.hidden
    return out_steps


def test_gradient_parity_vs_reference(ref_modules):
    """Training-dynamics parity: d(total window loss)/d(theta) computed by
    torch autograd through the reference's graph/model/losses must match
    jax.grad through our scanned window, parameter by parameter."""
    import torch

    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.models.convert import from_state_dict
    from trackmpnn_tpu.train.step import schedule_to_device, window_forward

    RefTrackMPNN, ref_graph, ref_create_targets, RefCELoss, RefFocalLoss = ref_modules

    feats, bp, _ = make_sequence(num_tracks=4, num_frames=6, seed=41,
                                 miss_rate=0.1, fp_rate=0.2)
    X = feats.astype(np.float32)
    y = bp[:, :2].astype(np.int64)

    torch.manual_seed(7)
    model = RefTrackMPNN(features="2d", ncategories=3, nhidden=16,
                         nattheads=0, msg_type="diff")
    model.train()
    ce = RefCELoss()
    focal = RefFocalLoss(gamma=0)

    # ----- reference: accumulate loss over the window, then backward
    X_t = torch.tensor(X)[None]
    y_t = torch.tensor(y)[None]
    out = ref_graph.initialize_graph(X_t, y_t, t_st=0, mode="train", cuda=False)
    y_pred, g_feats, node_adj, edge_adj, labels, t_st, t_end = out
    scores, logits, states, _ = model(g_feats, None, node_adj, edge_adj)

    def step_losses_ref(scores, logits, y_pred, labels, node_adj):
        idx_node = torch.nonzero(y_pred[:, 0] != -1)[:, 0]
        idx_edge = torch.nonzero(y_pred[:, 0] == -1)[:, 0]
        targets = ref_create_targets(labels, node_adj, idx_node)
        lc = ce(logits, targets, node_adj, idx_node)
        lf = focal(scores[idx_node, 0], targets[idx_node]) + \
            focal(scores[idx_edge, 0], targets[idx_edge])
        return lc + lf

    total = step_losses_ref(scores, logits, y_pred, labels, node_adj)
    sc2 = torch.cat((1 - scores, scores), dim=1)
    for t_cur in range(t_st, t_end):
        y_pred, g_feats, node_adj, edge_adj, labels = ref_graph.update_graph(
            node_adj, labels, sc2, y_pred, X_t, y_t, t_cur,
            use_hungraian=False, mode="train", cuda=False)
        scores, logits, states, _ = model(g_feats, states, node_adj, edge_adj)
        total = total + step_losses_ref(scores, logits, y_pred, labels, node_adj)
        sc2 = torch.cat((1 - scores, scores), dim=1)
    model.zero_grad()
    total.backward()
    ref_grads = {k: p.grad.detach().numpy().copy()
                 for k, p in model.named_parameters() if p.grad is not None}

    # ----- ours: jax.grad of the scanned window loss with the same weights
    import jax

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params, stats = from_state_dict(model.state_dict(), cfg)
    ws = build_window_schedule(X, y, bucket=64)
    sb = schedule_to_device(ws)

    def loss_fn(p):
        loss, _ = window_forward(p, stats, cfg, sb, tp_classifier=True, train=True)
        return loss

    loss_val, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_val), float(total.detach()), rtol=1e-4)

    b = grads["branches"][0]
    pairs = {
        "input_transforms.0.0.weight": np.asarray(b["input"]["lin1"]["w"]).T,
        "input_transforms.0.0.bias": np.asarray(b["input"]["lin1"]["b"]),
        "input_transforms.0.1.weight": np.asarray(b["input"]["bn"]["gamma"]),
        "input_transforms.0.1.bias": np.asarray(b["input"]["bn"]["beta"]),
        "input_transforms.0.3.weight": np.asarray(b["input"]["lin2"]["w"]).T,
        "input_transforms.0.3.bias": np.asarray(b["input"]["lin2"]["b"]),
        "factor_grus.0.edge_gru.weight_ih": np.asarray(b["edge_gru"]["w_ih"]).T,
        "factor_grus.0.edge_gru.weight_hh": np.asarray(b["edge_gru"]["w_hh"]).T,
        "factor_grus.0.edge_gru.bias_ih": np.asarray(b["edge_gru"]["b_ih"]),
        "factor_grus.0.edge_gru.bias_hh": np.asarray(b["edge_gru"]["b_hh"]),
        "factor_grus.0.node_gru.weight_ih": np.asarray(b["node_gru"]["w_ih"]).T,
        "factor_grus.0.node_gru.weight_hh": np.asarray(b["node_gru"]["w_hh"]).T,
        "factor_grus.0.node_gru.bias_ih": np.asarray(b["node_gru"]["b_ih"]),
        "factor_grus.0.node_gru.bias_hh": np.asarray(b["node_gru"]["b_hh"]),
        "output_transform_node.weight": np.asarray(grads["out_node"]["w"]).T,
        "output_transform_node.bias": np.asarray(grads["out_node"]["b"]),
        "output_transform_edge.weight": np.asarray(grads["out_edge"]["w"]).T,
        "output_transform_edge.bias": np.asarray(grads["out_edge"]["b"]),
    }
    for name, ours in pairs.items():
        ref = ref_grads[name]
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-5,
                                   err_msg=f"gradient mismatch: {name}")


def reference_inference(ref_modules, model, X, y, cur_win, ret_win, hungarian):
    """The reference's val/infer rolling loop (train.py:223-260 shape),
    driven directly through its graph engine; returns y_out."""
    import torch

    _, ref_graph, _, _, _ = ref_modules
    model.eval()
    X_t = torch.tensor(X)[None]
    y_t = torch.tensor(y)[None]
    y_out = y.copy()
    y_out[:, 1] = -1

    out = ref_graph.initialize_graph(X_t, y_t, t_st=0, mode="test", cuda=False)
    y_pred, feats, node_adj, edge_adj, labels, t_st, t_end = out
    if y_pred is None:
        return y_out
    with torch.no_grad():
        scores, logits, states, _ = model(feats, None, node_adj, edge_adj)
        sc2 = torch.cat((1 - scores, scores), dim=1)
        t_skip = t_st
        for t_cur in range(t_st, t_end):
            if t_cur < t_skip:
                continue
            if feats.size()[0] == 0 and states.size()[0] == 0:
                out = ref_graph.initialize_graph(X_t, y_t, t_st=t_cur,
                                                 mode="test", cuda=False)
                y_pred, feats, node_adj, edge_adj, labels, t_skip, _ = out
                if y_pred is None:
                    break
                states = None
            else:
                y_pred, feats, node_adj, edge_adj, labels = ref_graph.update_graph(
                    node_adj, labels, sc2, y_pred, X_t, y_t, t_cur,
                    use_hungraian=hungarian, mode="test", cuda=False)
            scores, logits, states, _ = model(feats, states, node_adj, edge_adj)
            sc2 = torch.cat((1 - scores, scores), dim=1)
            t_upto = t_end if t_cur == t_end - 1 else t_cur - cur_win + 2
            y_pred, y_out, states, node_adj, labels, sc2 = ref_graph.decode_tracks(
                states, node_adj, labels, sc2, y_pred, y_out, t_upto, ret_win,
                use_hungraian=hungarian, cuda=False)
    return y_out


@pytest.mark.parametrize("hungarian,nattheads", [(False, 0), (True, 0), (False, 2)])
def test_full_inference_parity_vs_reference(ref_modules, hungarian, nattheads):
    """Identical weights + detections => identical final tracks through the
    reference's update/decode loop and our Tracker (GAT runs dropout-free in
    eval mode, so attention models are covered here)."""
    import jax  # noqa: F401

    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.decode import Tracker, TrackerConfig
    from trackmpnn_tpu.models import mpnn

    feats, bp, _ = make_sequence(num_tracks=4, num_frames=8, seed=23,
                                 miss_rate=0.1, fp_rate=0.2)
    X = feats.astype(np.float32)
    y = bp[:, :2].astype(np.int64)
    nhidden = 16
    model, _ = reference_rollout(ref_modules, X, y, nhidden,
                                 nattheads=nattheads)  # seeds weights
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=nhidden,
                           nattheads=nattheads)
    params, stats = torch_to_params(model, cfg)

    ref_out = reference_inference(ref_modules, model, X, y, cur_win=5,
                                  ret_win=2, hungarian=hungarian)
    tracker = Tracker(params, stats, cfg, TrackerConfig(
        cur_win_size=5, ret_win_size=2, hungarian=hungarian, bucket=128))
    our_out = tracker.run(X, y)
    np.testing.assert_array_equal(our_out, ref_out)


@pytest.mark.parametrize("features,msg_type", [
    ("2d", "diff"),
    ("2d", "concat"),
    ("2d+temp", "diff"),
    ("2d+temp+vis", "diff"),   # full 3-branch model, synthetic vis columns
])
def test_full_window_parity_vs_reference(ref_modules, features, msg_type):
    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.models import mpnn

    feats, bp, _ = make_sequence(num_tracks=4, num_frames=7, seed=17,
                                 miss_rate=0.1, fp_rate=0.2)
    X = feats.astype(np.float32)
    y = bp[:, :2].astype(np.int64)
    rng = np.random.default_rng(99)
    if "temp" in features:
        X = np.concatenate([X, rng.normal(size=(X.shape[0], 2)).astype(np.float32)], 1)
    if "vis" in features:
        X = np.concatenate([X, rng.normal(size=(X.shape[0], 128)).astype(np.float32)], 1)

    nhidden = 16
    model, ref_steps = reference_rollout(ref_modules, X, y, nhidden,
                                         features=features, msg_type=msg_type)
    cfg = mpnn.ModelConfig(features=features, ncategories=3, nhidden=nhidden,
                           msg_type=msg_type)
    params, stats = torch_to_params(model, cfg)
    ours = our_rollout(params, stats, cfg, X, y)

    assert len(ref_steps) == len(ours), (len(ref_steps), len(ours))
    for s, ((r_logits, r_targets, r_ce, r_f), (o_logits, o_targets, o_ce, o_f, n)) \
            in enumerate(zip(ref_steps, ours)):
        assert n == len(r_logits), (s, n, len(r_logits))
        np.testing.assert_allclose(o_logits[:n], r_logits, rtol=2e-4, atol=2e-5,
                                   err_msg=f"logits diverge at step {s}")
        np.testing.assert_array_equal(o_targets[:n], r_targets,
                                      err_msg=f"targets diverge at step {s}")
        np.testing.assert_allclose(o_ce, r_ce, rtol=1e-3, atol=1e-5,
                                   err_msg=f"CE loss diverges at step {s}")
        np.testing.assert_allclose(o_f, r_f, rtol=1e-3, atol=1e-5,
                                   err_msg=f"focal loss diverges at step {s}")
