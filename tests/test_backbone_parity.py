"""Whole-network backbone activation parity vs the ACTUAL reference code.

Runs the reference's torch `EESPNet_Seg` (/root/reference/models/espv2/
SegmentationModel.py:14-69) and `DLASeg` (/root/reference/models/dla/
pose_dla_dcn.py:426-481) forward on CPU with the SAME weights as the JAX
ports (via the framework's checkpoint converters) and requires feature-map
allclose.  The reference's compiled DCNv2 extension is replaced by the
pure-torch oracle (tests/torch_dcn_oracle.py) injected into sys.modules.
This is the BASELINE.md north-star check at the network level, extending
the round-1 primitive-level tests.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(5)
    return torch


def _randomize(torch, model, scale=0.05, offset_scale=0.05):
    """Seeded random weights everywhere (default inits can be degenerate -
    e.g. zero offset branches make a DCN an ordinary conv); BN running
    stats get non-trivial values so eval mode is a real check."""
    g = torch.Generator().manual_seed(7)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_var"):
            sd[k] = 1.0 + 0.3 * torch.rand(v.shape, generator=g)
        elif k.endswith("running_mean"):
            sd[k] = 0.2 * torch.randn(v.shape, generator=g)
        elif "conv_offset_mask" in k:
            sd[k] = offset_scale * torch.randn(v.shape, generator=g)
        else:
            sd[k] = scale * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    return model


def _save_state(torch, model):
    f = tempfile.NamedTemporaryFile(suffix=".pth", delete=False)
    torch.save(model.state_dict(), f.name)
    return f.name


# ----------------------------------------------------------------- espv2 ----
@pytest.fixture(scope="module")
def espv2_pair(torch):
    sys.path.insert(0, REF)
    try:
        from models.espv2.SegmentationModel import EESPNet_Seg
    finally:
        sys.path.remove(REF)
    ref = _randomize(torch, EESPNet_Seg(classes=8, s=1.0, pretrained=None))
    path = _save_state(torch, ref)

    import jax
    from trackmpnn_tpu.backbones import espnetv2 as E

    params = E.init_espnetv2_seg(jax.random.key(0), classes=8, s=1.0)
    params = E.load_pretrained(params, path)
    os.unlink(path)
    return ref, params


def test_espv2_whole_net_eval(torch, espv2_pair):
    from trackmpnn_tpu.backbones import espnetv2 as E

    ref, params = espv2_pair
    ref.eval()
    x = 0.5 * torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = ref(x).permute(0, 2, 3, 1).numpy()
    got = np.asarray(E.apply_espnetv2_seg(params, x.permute(0, 2, 3, 1).numpy(),
                                          train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_espv2_whole_net_train_bn(torch, espv2_pair):
    """Train-mode BN (batch statistics) parity; torch dropout disabled so
    the comparison is deterministic (our port takes drop_rng=None)."""
    from trackmpnn_tpu.backbones import espnetv2 as E

    ref, params = espv2_pair
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0
    x = 0.5 * torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        want = ref(x).permute(0, 2, 3, 1).numpy()
    got = np.asarray(E.apply_espnetv2_seg(params, x.permute(0, 2, 3, 1).numpy(),
                                          train=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_espv2_running_stat_updates(torch, espv2_pair):
    """collect_bn_updates reproduces torch's momentum-updated running
    buffers after one train-mode forward (the reference trains the embed
    net in .train() mode — kitti_mot.py:119-132)."""
    import copy

    from trackmpnn_tpu.backbones import espnetv2 as E
    from trackmpnn_tpu.backbones.layers import collect_bn_updates

    import jax

    ref, _ = espv2_pair
    ref = copy.deepcopy(ref)  # train-mode forward mutates buffers
    # convert from the ref's CURRENT buffers (earlier train-mode tests in
    # this module already moved them past the fixture-time conversion)
    path = _save_state(torch, ref)
    params = E.init_espnetv2_seg(jax.random.key(0), classes=8, s=1.0)
    params = E.load_pretrained(params, path)
    os.unlink(path)
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0
    x = 0.5 * torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        ref(x)
    want = {k: v.numpy() for k, v in ref.state_dict().items()
            if ".running_mean" in k or ".running_var" in k}

    with collect_bn_updates() as bn_new:
        E.apply_espnetv2_seg(params, x.permute(0, 2, 3, 1).numpy(), train=True)

    checked = 0
    for k, w in want.items():
        ours = k if k in params else None
        if ours is None:
            continue  # e.g. aux classifier branches not in the port
        assert ours in bn_new, f"no running-stat update captured for {ours}"
        np.testing.assert_allclose(np.asarray(bn_new[ours]), w,
                                   rtol=1e-4, atol=1e-5, err_msg=ours)
        checked += 1
    assert checked >= 20  # the net has dozens of BN layers


# ------------------------------------------------------------------- dla ----
@pytest.fixture(scope="module")
def dla_pair(torch):
    import types

    import torch_dcn_oracle

    # satisfy `from .DCNv2.dcn_v2 import DCN` without the CUDA extension
    pkg = types.ModuleType("models.dla.DCNv2")
    mod = types.ModuleType("models.dla.DCNv2.dcn_v2")
    mod.DCN = torch_dcn_oracle.DCN
    sys.modules.setdefault("models.dla.DCNv2", pkg)
    sys.modules.setdefault("models.dla.DCNv2.dcn_v2", mod)

    sys.path.insert(0, REF)
    try:
        from models.dla.pose_dla_dcn import DLASeg
    finally:
        sys.path.remove(REF)
    ref = DLASeg("dla34", {"trk": 8}, pretrained=False, down_ratio=4,
                 final_kernel=1, last_level=5, head_conv=32)
    ref = _randomize(torch, ref)
    path = _save_state(torch, ref)

    import jax
    from trackmpnn_tpu.backbones import dla as D

    params = D.init_dlaseg(jax.random.key(0), {"trk": 8}, head_conv=32)
    params = D.load_pretrained(params, path)
    os.unlink(path)
    return ref, params


def test_dcn_oracle_matches_jax_dcn(torch):
    """The pure-torch DCN (used to stand in for the CUDA extension) and our
    XLA decomposition agree bit-for-tolerance on random offsets/weights."""
    import jax
    import torch_dcn_oracle
    from trackmpnn_tpu.backbones import deform_conv as DC

    m = torch_dcn_oracle.DCN(6, 5, (3, 3), stride=1, padding=1)
    g = torch.Generator().manual_seed(11)
    m.conv_offset_mask.weight.data = 0.3 * torch.randn(
        m.conv_offset_mask.weight.shape, generator=g)
    m.conv_offset_mask.bias.data = 0.5 * torch.randn(27, generator=g)
    x = torch.randn(2, 6, 9, 11, generator=g)
    with torch.no_grad():
        want = m(x).permute(0, 2, 3, 1).numpy()
    p = {
        "weight": np.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0)
                             ).reshape(-1, 5),
        "bias": m.bias.detach().numpy(),
        "offset_weight": m.conv_offset_mask.weight.detach().numpy().transpose(2, 3, 1, 0),
        "offset_bias": m.conv_offset_mask.bias.detach().numpy(),
    }
    p = jax.tree_util.tree_map(np.asarray, p)
    got = np.asarray(DC.apply_dcn(p, x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dla_whole_net_eval(torch, dla_pair):
    from trackmpnn_tpu.backbones import dla as D

    ref, params = dla_pair
    ref.eval()
    x = 0.5 * torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        want = ref(x)[0]["trk"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(D.apply_dlaseg(params, x.permute(0, 2, 3, 1).numpy(),
                                    {"trk": 8}, head_conv=32, train=False)["trk"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_dla_whole_net_train_bn(torch, dla_pair):
    from trackmpnn_tpu.backbones import dla as D

    ref, params = dla_pair
    ref.train()
    x = 0.5 * torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(10))
    with torch.no_grad():
        want = ref(x)[0]["trk"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(D.apply_dlaseg(params, x.permute(0, 2, 3, 1).numpy(),
                                    {"trk": 8}, head_conv=32, train=True)["trk"])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
