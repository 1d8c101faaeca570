"""Dense PyTorch oracle for activation-parity tests.

An independent implementation of the TrackMPNN math in plain dense torch,
written from the behavioral spec (SURVEY.md 3.4/3.5): per-branch
Linear-BN-ReLU-Linear input transform over newly-introduced rows, edge-GRU
over endpoint hidden differences, node-GRU over signed incident-edge sums,
(optional) GAT attention, and biased detection/edge output heads.  Used only
by tests: the framework's TPU path must produce `allclose` activations
against this oracle (the BASELINE.md north-star parity requirement), which
pins PyTorch GRUCell gate order and BatchNorm1d train/eval semantics.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as tnn


def dense_adjacency(is_det, past, fut, live):
    """Build the reference-style node_adj/edge_adj (with diagonals) densely."""
    n = len(is_det)
    node_adj = torch.zeros((n, n))
    for e in range(n):
        if live[e] and not is_det[e]:
            node_adj[e, past[e]] = 1.0
            node_adj[e, fut[e]] = -1.0
    I_node = torch.diag(torch.tensor([1.0 if (live[i] and is_det[i]) else 0.0 for i in range(n)]))
    I_edge = torch.diag(torch.tensor([1.0 if (live[i] and not is_det[i]) else 0.0 for i in range(n)]))
    edge_adj = node_adj.t().clone()
    return node_adj + I_node, edge_adj + I_edge, I_node, I_edge


class OracleModel:
    """Dense torch TrackMPNN sharing weights with a jax param pytree."""

    def __init__(self, params, cfg):
        self.cfg = cfg
        self.branches = []
        for bi, (_, width) in enumerate(cfg.branches):
            bp = params["branches"][bi]
            lin1 = tnn.Linear(width, cfg.nhidden)
            lin1.weight.data = torch.tensor(np.asarray(bp["input"]["lin1"]["w"]).T.copy())
            lin1.bias.data = torch.tensor(np.asarray(bp["input"]["lin1"]["b"]).copy())
            bn = tnn.BatchNorm1d(cfg.nhidden)
            bn.weight.data = torch.tensor(np.asarray(bp["input"]["bn"]["gamma"]).copy())
            bn.bias.data = torch.tensor(np.asarray(bp["input"]["bn"]["beta"]).copy())
            lin2 = tnn.Linear(cfg.nhidden, cfg.nhidden)
            lin2.weight.data = torch.tensor(np.asarray(bp["input"]["lin2"]["w"]).T.copy())
            lin2.bias.data = torch.tensor(np.asarray(bp["input"]["lin2"]["b"]).copy())

            def make_gru(gp, n_in):
                cell = tnn.GRUCell(n_in, cfg.nhidden)
                cell.weight_ih.data = torch.tensor(np.asarray(gp["w_ih"]).T.copy())
                cell.weight_hh.data = torch.tensor(np.asarray(gp["w_hh"]).T.copy())
                cell.bias_ih.data = torch.tensor(np.asarray(gp["b_ih"]).copy())
                cell.bias_hh.data = torch.tensor(np.asarray(gp["b_hh"]).copy())
                return cell

            edge_in = 2 * cfg.nhidden if cfg.msg_type == "concat" else cfg.nhidden
            branch = {
                "lin1": lin1,
                "bn": bn,
                "lin2": lin2,
                "edge_gru": make_gru(bp["edge_gru"], edge_in),
                "node_gru": make_gru(bp["node_gru"], cfg.nhidden),
            }
            if cfg.nattheads > 0:
                branch["gat"] = [
                    {
                        "W_att": torch.tensor(np.asarray(h["W_att"]).copy()),
                        "a": torch.tensor(np.asarray(h["a"]).copy()),
                    }
                    for h in bp["gat"]
                ]
            self.branches.append(branch)
        nb = len(cfg.branches)
        self.out_node = tnn.Linear(nb * cfg.nhidden, 1)
        self.out_node.weight.data = torch.tensor(np.asarray(params["out_node"]["w"]).T.copy())
        self.out_node.bias.data = torch.tensor(np.asarray(params["out_node"]["b"]).copy())
        self.out_edge = tnn.Linear(nb * cfg.nhidden, 1)
        self.out_edge.weight.data = torch.tensor(np.asarray(params["out_edge"]["w"]).T.copy())
        self.out_edge.bias.data = torch.tensor(np.asarray(params["out_edge"]["b"]).copy())

    def _gat(self, branch, h, node_adj_norm, edge_adj_norm):
        acc = None
        for head in branch["gat"]:
            h_att = h @ head["W_att"]
            h_plus = (node_adj_norm > 0).float() @ h_att
            h_minus = (node_adj_norm < 0).float() @ h_att
            a_in = torch.abs(h_plus - h_minus)
            e_col = torch.nn.functional.leaky_relu(a_in @ head["a"], 0.2)  # (N,1)
            e = e_col.t().repeat(h.shape[0], 1)  # (N, N): e[i, j] = e_col[j]
            att = torch.where(edge_adj_norm != 0, e, torch.tensor(-9e15))
            att = torch.softmax(att, dim=1)
            hp = (att * edge_adj_norm) @ h
            acc = hp if acc is None else acc + hp
        return acc / len(branch["gat"])

    @torch.no_grad()
    def forward(self, feats, h_prev, is_det, past, fut, live, new, train):
        """feats: (N, F) full-capacity features. Returns scores, logits, h_out."""
        n = len(is_det)
        node_adj, edge_adj, I_node, I_edge = dense_adjacency(is_det, past, fut, live)
        node_adj_norm = node_adj - I_node
        edge_adj_norm = edge_adj - I_edge

        new_idx = [i for i in range(n) if new[i]]
        cfg = self.cfg
        hs, off = [], 0
        for bi, (_, width) in enumerate(cfg.branches):
            br = self.branches[bi]
            br["bn"].train(train)
            x = torch.tensor(np.asarray(feats[:, off : off + width]).copy())
            off += width
            h_b = torch.zeros((n, cfg.nhidden))
            if h_prev is not None:
                hp = torch.tensor(np.asarray(h_prev[:, bi * cfg.nhidden : (bi + 1) * cfg.nhidden]).copy())
                for i in range(n):
                    if live[i] and not new[i]:
                        h_b[i] = hp[i]
            if new_idx:
                x_new = x[new_idx]
                y = br["lin2"](torch.relu(br["bn"](br["lin1"](x_new))))
                for k, i in enumerate(new_idx):
                    if is_det[i]:
                        h_b[i] = y[k]
            hs.append(h_b)

        outs = []
        for bi in range(len(cfg.branches)):
            br = self.branches[bi]
            h = hs[bi]
            if cfg.msg_type == "concat":
                ns = torch.cat(
                    [(node_adj_norm > 0).float() @ h, (node_adj_norm < 0).float() @ h], dim=1
                )
            else:
                ns = node_adj_norm @ h
            edge_out = br["edge_gru"](ns, h)
            if cfg.nattheads > 0:
                es = self._gat(br, h, node_adj_norm, edge_adj_norm)
            else:
                es = edge_adj_norm @ h
            node_out = br["node_gru"](es, h)
            outs.append(I_edge @ edge_out + I_node @ node_out)

        h_out = torch.cat(outs, dim=1)
        y = I_node @ self.out_node(h_out) + I_edge @ self.out_edge(h_out)
        return torch.sigmoid(y)[:, 0].numpy(), y[:, 0].numpy(), h_out.numpy()
