"""BDD plateau divergence probe: on the ACTUAL parity tree, compare
feature tensors, window losses, and full-window gradients between the
reference (torch, its own BDD100kMOTDataset + graph engine) and our
trainer path, at the converged-parity recipe's settings
(ncategories=8, tp_classifier=False, nhidden=64).

Background: at lr 1e-4 the reference escapes the all-negative plateau by
epoch ~5 on seeds 1 and 5 while our cli.train is still flat at epoch 24
(logs/bdd_parity_r4.log, logs/bdd_ours_e60.log) — yet at lr 5e-4 ours
converges past the reference, so labels/features can learn.  This pins
where the update paths diverge.

  python tools/debug_bdd_grad_parity.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools", "refshim"))
REF = "/root/reference"

# the reference BDD module imports the DCNv2 CUDA ext at module scope;
# serve the pure-torch oracle under that name (same as run_reference_train)
import types

import torch_dcn_oracle

_pkg = types.ModuleType("models.dla.DCNv2")
_pkg.__path__ = []
_mod = types.ModuleType("models.dla.DCNv2.dcn_v2")
_mod.DCN = torch_dcn_oracle.DCN
sys.modules["models.dla.DCNv2"] = _pkg
sys.modules["models.dla.DCNv2.dcn_v2"] = _mod

import PIL.Image  # ref does `import PIL` + PIL.Image.open
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

TREE = os.environ.get("BDD_TREE", "/tmp/bdd_parity/bdd")


def main():
    import torch

    sys.path.insert(0, REF)
    from dataset.bdd100k_mot import BDD100kMOTDataset
    from models.loss import CELoss as RefCELoss
    from models.loss import FocalLoss as RefFocalLoss
    from models.loss import create_targets as ref_create_targets
    from models.track_mpnn import TrackMPNN as RefTrackMPNN
    from utils import graph as ref_graph
    sys.path.remove(REF)

    ds = BDD100kMOTDataset(TREE, "train", "All", "libra", "2d",
                           None, 5, 5, None, False, False)
    print("ref dataset len:", len(ds), "classes:", len(ds.class_dict))

    # ---- our loader on the same tree
    from trackmpnn_tpu.data.bdd100k import BDD100kMOTDataset as OursBDD

    ours_ds = OursBDD(TREE, "train", "All", "libra", "2d",
                      cur_win_size=5, ret_win_size=5)
    print("our dataset len:", len(ours_ds))

    # NOTE: chunk skip-frames are drawn from unseeded python `random` at
    # dataset construction on BOTH sides (ref bdd100k_mot.py:212), so
    # per-index window CONTENTS are not comparable across instantiations;
    # only same-window (ref-loaded) losses/grads below are.

    # ---- gradient parity on window 0 with shared weights
    X_t, bbox_pred, _, _ = ds[0]
    X = (X_t.numpy() if hasattr(X_t, "numpy") else np.asarray(X_t)).astype(np.float32)
    y = (bbox_pred.numpy() if hasattr(bbox_pred, "numpy")
         else np.asarray(bbox_pred))[:, :2].astype(np.int64)

    torch.manual_seed(5)
    model = RefTrackMPNN(features="2d", ncategories=8, nhidden=64,
                         nattheads=0, msg_type="diff")
    model.train()
    ce = RefCELoss()
    focal = RefFocalLoss(gamma=0)

    X_tt = torch.tensor(X)[None]
    y_tt = torch.tensor(y)[None]
    out = ref_graph.initialize_graph(X_tt, y_tt, t_st=0, mode="train",
                                     cuda=False)
    y_pred, g_feats, node_adj, edge_adj, labels, t_st, t_end = out
    scores, logits, states, _ = model(g_feats, None, node_adj, edge_adj)

    def step_losses_ref(scores, logits, y_pred, labels, node_adj):
        idx_node = torch.nonzero(y_pred[:, 0] != -1)[:, 0]
        idx_edge = torch.nonzero(y_pred[:, 0] == -1)[:, 0]
        targets = ref_create_targets(labels, node_adj, idx_node)
        lc = ce(logits, targets, node_adj, idx_node)
        lf = focal(scores[idx_edge, 0], targets[idx_edge])  # no-tp-classifier
        return lc + lf

    total = step_losses_ref(scores, logits, y_pred, labels, node_adj)
    sc2 = torch.cat((1 - scores, scores), dim=1)
    sc2[torch.nonzero(y_pred[:, 0] != -1)[:, 0], 0] = 0
    sc2[torch.nonzero(y_pred[:, 0] != -1)[:, 0], 1] = 1
    for t_cur in range(t_st, t_end):
        y_pred, g_feats, node_adj, edge_adj, labels = ref_graph.update_graph(
            node_adj, labels, sc2, y_pred, X_tt, y_tt, t_cur,
            use_hungraian=False, mode="train", cuda=False)
        scores, logits, states, _ = model(g_feats, states, node_adj, edge_adj)
        total = total + step_losses_ref(scores, logits, y_pred, labels,
                                        node_adj)
        sc2 = torch.cat((1 - scores, scores), dim=1)
        sc2[torch.nonzero(y_pred[:, 0] != -1)[:, 0], 0] = 0
        sc2[torch.nonzero(y_pred[:, 0] != -1)[:, 0], 1] = 1
    model.zero_grad()
    total.backward()
    ref_grads = {k: p.grad.detach().numpy().copy()
                 for k, p in model.named_parameters() if p.grad is not None}
    print("ref window loss:", float(total))

    # ---- ours
    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.models.convert import from_state_dict
    from trackmpnn_tpu.train.step import schedule_to_device, window_forward

    cfg = mpnn.ModelConfig(features="2d", ncategories=8, nhidden=64)
    params, stats = from_state_dict(model.state_dict(), cfg)
    ws = build_window_schedule(X, y, bucket=64)
    sb = schedule_to_device(ws)

    def loss_fn(p):
        loss, _ = window_forward(p, stats, cfg, sb, tp_classifier=False,
                                 train=True)
        return loss

    loss_val, grads = jax.value_and_grad(loss_fn)(params)
    print("our window loss:", float(loss_val),
          "match:", np.isclose(float(loss_val), float(total), rtol=1e-4))

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
    worst = 0.0
    for name, ours in pairs.items():
        ref = ref_grads[name]
        denom = max(np.abs(ref).max(), 1e-8)
        rel = np.abs(ours - ref).max() / denom
        worst = max(worst, rel)
        flag = "OK " if rel < 5e-3 else "MISMATCH"
        print(f"  {flag} {name}: max_rel={rel:.2e} "
              f"|ref|max={np.abs(ref).max():.3e} |ours|max={np.abs(ours).max():.3e}")
    print("worst rel:", worst)


if __name__ == "__main__":
    main()
