"""Checkpointing: full train state, unlike the reference.

The reference saves only model weights on val-MOTA improvement
(ref train.py:300-307) so resume restarts optimizer/schedule state; here
the whole train state (params, batch stats, optimizer state, epoch,
best metric) round-trips.  Format: a single .npz of flattened pytree
leaves + a json manifest of the tree structure - dependency-free and
readable anywhere.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, state: dict) -> None:
    """state: arbitrary pytree of arrays / scalars / None."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    meta = []
    for i, leaf in enumerate(leaves):
        if leaf is None:
            meta.append({"kind": "none"})
        elif isinstance(leaf, (int, float, bool, str)):
            meta.append({"kind": "py", "value": leaf, "type": type(leaf).__name__})
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            meta.append({"kind": "array"})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=json.dumps({"leaves": meta, "treedef": str(treedef)}), **arrays)


def load(path: str, like: dict) -> dict:
    """Restore into the structure of `like` (tree shapes must match)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if len(meta["leaves"]) != len(leaves_like):
        raise ValueError(
            f"checkpoint has {len(meta['leaves'])} leaves, expected {len(leaves_like)}"
        )
    out = []
    for i, m in enumerate(meta["leaves"]):
        if m["kind"] == "none":
            out.append(None)
        elif m["kind"] == "py":
            t = {"int": int, "float": float, "bool": bool, "str": str}[m["type"]]
            out.append(t(m["value"]))
        else:
            out.append(data[f"leaf_{i}"])
    return jax.tree_util.tree_unflatten(treedef, out)
