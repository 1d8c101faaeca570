"""Checkpointing: full train state, unlike the reference.

The reference saves only model weights on val-MOTA improvement
(ref train.py:300-307) so resume restarts optimizer/schedule state; here
the whole train state (params, batch stats, optimizer state, epoch,
best metric) round-trips.  Format: one .npz whose keys are pytree key
paths - self-describing, dependency-free, and loadable into a PARTIAL
structure (e.g. inference restores only params + batch_stats).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save(path: str, state) -> None:
    """state: pytree of arrays / python scalars / None subtrees."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays, scalars = {}, {}
    for kp, leaf in leaves:
        key = _path_str(kp)
        if isinstance(leaf, (int, float, bool, str)):
            scalars[key] = leaf
        else:
            arrays["arr:" + key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __scalars__=json.dumps(scalars), **arrays)


def load(path: str, like):
    """Restore into the structure of `like`; every leaf present in `like`
    must exist in the checkpoint (extra checkpoint entries are ignored,
    enabling partial restores)."""
    data = np.load(path, allow_pickle=False)
    scalars = json.loads(str(data["__scalars__"]))
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for kp, leaf in leaves:
        key = _path_str(kp)
        if "arr:" + key in data.files:
            out.append(data["arr:" + key])
        elif key in scalars:
            out.append(type(leaf)(scalars[key]) if leaf is not None else scalars[key])
        else:
            raise KeyError(f"checkpoint {path} is missing leaf {key!r}")
    return jax.tree_util.tree_unflatten(treedef, [l for _, l in zip(leaves, out)])
