"""Weight conversion: reference .pth -> our params -> back, and strict
re-load into the actual reference model."""

import os
import sys

import jax
import numpy as np
import pytest
import torch

from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.models.convert import from_state_dict, load_reference_checkpoint, to_state_dict

REF = "/root/reference"


def test_roundtrip(tmp_path):
    cfg = mpnn.ModelConfig(features="2d+temp", ncategories=3, nhidden=16, nattheads=2)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    sd = to_state_dict(params, stats, cfg)
    p2, s2 = from_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s2), jax.tree_util.tree_leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_export_loads_into_reference_strict(tmp_path):
    """to_state_dict output must satisfy the reference's strict
    load_state_dict - proves full key/shape compatibility both ways."""
    sys.path.insert(0, REF)
    try:
        from models.track_mpnn import TrackMPNN as RefTrackMPNN
    finally:
        sys.path.remove(REF)

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(1), cfg)
    stats = mpnn.init_batch_stats(cfg)
    sd = {k: torch.tensor(v) for k, v in to_state_dict(params, stats, cfg).items()}
    ref = RefTrackMPNN(features="2d", ncategories=3, nhidden=16, nattheads=0,
                       msg_type="diff")
    ref.load_state_dict(sd, strict=True)

    # and back through a saved .pth
    path = str(tmp_path / "track-mpnn_0001.pth")
    torch.save(ref.state_dict(), path)
    p2, s2 = load_reference_checkpoint(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
