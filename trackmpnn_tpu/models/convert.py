"""Reference-checkpoint conversion: load arangesh/TrackMPNN .pth weights.

A user of the reference can bring a trained `track-mpnn_*.pth` state_dict
straight into this framework - module names follow the reference layout
(input_transforms.N.{0,1,3}, factor_grus.N.{edge,node}_gru, gat heads,
output_transform_{node,edge}; /root/reference/models/track_mpnn.py:11-43).
The activation-parity suite (tests/test_reference_parity.py) guarantees the
converted model reproduces the reference's outputs.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from trackmpnn_tpu.models import mpnn


def from_state_dict(sd: Dict[str, np.ndarray], cfg: mpnn.ModelConfig):
    """torch state_dict (tensors or arrays) -> (params, batch_stats)."""
    import jax.numpy as jnp

    def get(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def t(k):
        return jnp.asarray(get(k).T.copy())

    def a(k):
        return jnp.asarray(get(k).copy())

    branches, stats_b = [], []
    for bi in range(len(cfg.branches)):
        branch = {
            "input": {
                "lin1": {"w": t(f"input_transforms.{bi}.0.weight"),
                         "b": a(f"input_transforms.{bi}.0.bias")},
                "bn": {"gamma": a(f"input_transforms.{bi}.1.weight"),
                       "beta": a(f"input_transforms.{bi}.1.bias")},
                "lin2": {"w": t(f"input_transforms.{bi}.3.weight"),
                         "b": a(f"input_transforms.{bi}.3.bias")},
            },
            "edge_gru": {"w_ih": t(f"factor_grus.{bi}.edge_gru.weight_ih"),
                         "w_hh": t(f"factor_grus.{bi}.edge_gru.weight_hh"),
                         "b_ih": a(f"factor_grus.{bi}.edge_gru.bias_ih"),
                         "b_hh": a(f"factor_grus.{bi}.edge_gru.bias_hh")},
            "node_gru": {"w_ih": t(f"factor_grus.{bi}.node_gru.weight_ih"),
                         "w_hh": t(f"factor_grus.{bi}.node_gru.weight_hh"),
                         "b_ih": a(f"factor_grus.{bi}.node_gru.bias_ih"),
                         "b_hh": a(f"factor_grus.{bi}.node_gru.bias_hh")},
        }
        if cfg.nattheads > 0:
            branch["gat"] = [
                {"W_att": a(f"factor_grus.{bi}.gat.{h}.W_att"),
                 "a": a(f"factor_grus.{bi}.gat.{h}.a")}
                for h in range(cfg.nattheads)
            ]
        branches.append(branch)
        stats_b.append({"bn": {
            "mean": a(f"input_transforms.{bi}.1.running_mean"),
            "var": a(f"input_transforms.{bi}.1.running_var"),
        }})
    params = {
        "branches": branches,
        "out_node": {"w": t("output_transform_node.weight"),
                     "b": a("output_transform_node.bias")},
        "out_edge": {"w": t("output_transform_edge.weight"),
                     "b": a("output_transform_edge.bias")},
    }
    return params, {"branches": stats_b}


def load_reference_checkpoint(path: str, cfg: mpnn.ModelConfig):
    """Load a reference track-mpnn .pth file into (params, batch_stats)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_state_dict(sd, cfg)


def to_state_dict(params, batch_stats, cfg: mpnn.ModelConfig) -> Dict[str, np.ndarray]:
    """The reverse direction: export weights a reference user can
    torch.load into the original implementation."""
    sd: Dict[str, np.ndarray] = {}
    for bi, branch in enumerate(params["branches"]):
        ip = branch["input"]
        sd[f"input_transforms.{bi}.0.weight"] = np.asarray(ip["lin1"]["w"]).T
        sd[f"input_transforms.{bi}.0.bias"] = np.asarray(ip["lin1"]["b"])
        sd[f"input_transforms.{bi}.1.weight"] = np.asarray(ip["bn"]["gamma"])
        sd[f"input_transforms.{bi}.1.bias"] = np.asarray(ip["bn"]["beta"])
        bs = batch_stats["branches"][bi]["bn"]
        sd[f"input_transforms.{bi}.1.running_mean"] = np.asarray(bs["mean"])
        sd[f"input_transforms.{bi}.1.running_var"] = np.asarray(bs["var"])
        sd[f"input_transforms.{bi}.1.num_batches_tracked"] = np.asarray(0)
        sd[f"input_transforms.{bi}.3.weight"] = np.asarray(ip["lin2"]["w"]).T
        sd[f"input_transforms.{bi}.3.bias"] = np.asarray(ip["lin2"]["b"])
        for cell in ("edge_gru", "node_gru"):
            sd[f"factor_grus.{bi}.{cell}.weight_ih"] = np.asarray(branch[cell]["w_ih"]).T
            sd[f"factor_grus.{bi}.{cell}.weight_hh"] = np.asarray(branch[cell]["w_hh"]).T
            sd[f"factor_grus.{bi}.{cell}.bias_ih"] = np.asarray(branch[cell]["b_ih"])
            sd[f"factor_grus.{bi}.{cell}.bias_hh"] = np.asarray(branch[cell]["b_hh"])
        if cfg.nattheads > 0:
            for h, head in enumerate(branch["gat"]):
                sd[f"factor_grus.{bi}.gat.{h}.W_att"] = np.asarray(head["W_att"])
                sd[f"factor_grus.{bi}.gat.{h}.a"] = np.asarray(head["a"])
    sd["output_transform_node.weight"] = np.asarray(params["out_node"]["w"]).T
    sd["output_transform_node.bias"] = np.asarray(params["out_node"]["b"])
    sd["output_transform_edge.weight"] = np.asarray(params["out_edge"]["w"]).T
    sd["output_transform_edge.bias"] = np.asarray(params["out_edge"]["b"])
    return sd
