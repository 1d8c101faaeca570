"""Op-level parity of backbone primitives vs torch functionals, plus
whole-net ESPNetv2 shape/finiteness and checkpoint-merge tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from trackmpnn_tpu.backbones import layers as L
from trackmpnn_tpu.backbones import espnetv2


def to_nchw(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def from_nchw(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_conv2d_grouped_dilated(rng):
    x = rng.normal(size=(2, 16, 20, 8)).astype(np.float32)
    w = rng.normal(size=(3, 3, 2, 8)).astype(np.float32)  # groups=4: I=2
    for stride, dil in [(1, 1), (2, 1), (1, 3), (2, 2)]:
        got = L.conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride,
                       dilation=dil, groups=4)
        tw = torch.tensor(w.transpose(3, 2, 0, 1))  # HWIO -> OIHW
        want = TF.conv2d(to_nchw(x), tw, stride=stride, dilation=dil,
                         padding=dil, groups=4)
        np.testing.assert_allclose(np.asarray(got), from_nchw(want), rtol=1e-4, atol=1e-4)


def test_depthwise_conv(rng):
    x = rng.normal(size=(1, 10, 10, 6)).astype(np.float32)
    w = rng.normal(size=(3, 3, 1, 6)).astype(np.float32)
    got = L.conv2d(jnp.asarray(x), jnp.asarray(w), groups=6)
    tw = torch.tensor(w.transpose(3, 2, 0, 1))
    want = TF.conv2d(to_nchw(x), tw, padding=1, groups=6)
    np.testing.assert_allclose(np.asarray(got), from_nchw(want), rtol=1e-4, atol=1e-4)


def test_avg_pool_count_include_pad(rng):
    x = rng.normal(size=(1, 9, 11, 4)).astype(np.float32)
    got = L.avg_pool2d(jnp.asarray(x), 3, 2, 1)
    want = TF.avg_pool2d(to_nchw(x), 3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), from_nchw(want), rtol=1e-5, atol=1e-6)


def test_bilinear_align_corners(rng):
    x = rng.normal(size=(1, 7, 9, 3)).astype(np.float32)
    got = L.resize_bilinear_align_corners(jnp.asarray(x), 14, 18)
    want = TF.interpolate(to_nchw(x), size=(14, 18), mode="bilinear",
                          align_corners=True)
    np.testing.assert_allclose(np.asarray(got), from_nchw(want), rtol=1e-4, atol=1e-5)


def test_prelu_batchnorm(rng):
    x = rng.normal(size=(2, 5, 5, 6)).astype(np.float32)
    alpha = rng.uniform(0.1, 0.5, 6).astype(np.float32)
    got = L.prelu(jnp.asarray(x), jnp.asarray(alpha))
    want = TF.prelu(to_nchw(x), torch.tensor(alpha))
    np.testing.assert_allclose(np.asarray(got), from_nchw(want), rtol=1e-6)

    gamma = rng.uniform(0.5, 2, 6).astype(np.float32)
    beta = rng.normal(size=6).astype(np.float32)
    mean = rng.normal(size=6).astype(np.float32)
    var = rng.uniform(0.5, 2, 6).astype(np.float32)
    bn_params = {"bn.weight": jnp.asarray(gamma), "bn.bias": jnp.asarray(beta),
                 "bn.running_mean": jnp.asarray(mean),
                 "bn.running_var": jnp.asarray(var)}
    got = L.bn2d(bn_params, "bn", jnp.asarray(x))
    want = TF.batch_norm(to_nchw(x), torch.tensor(mean), torch.tensor(var),
                         torch.tensor(gamma), torch.tensor(beta), False, 0.0, 1e-5)
    np.testing.assert_allclose(np.asarray(got), from_nchw(want), rtol=1e-4, atol=1e-5)


def test_espnetv2_seg_shapes():
    params = espnetv2.init_espnetv2_seg(jax.random.key(0), classes=32, s=1.0)
    x = jnp.zeros((1, 64, 96, 3))
    out = jax.jit(lambda p, x: espnetv2.apply_espnetv2_seg(p, x))(params, x)
    assert out.shape == (1, 64, 96, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_espnetv2_checkpoint_merge(tmp_path):
    params = espnetv2.init_espnetv2_seg(jax.random.key(0), classes=16, s=1.0)
    # fabricate a torch-style classification checkpoint for level1
    w = torch.randn(32, 3, 3, 3)
    sd = {"module.level1.conv.weight": w,
          "module.level1.bn.weight": torch.ones(32),
          "module.level1.bn.bias": torch.zeros(32),
          "module.level1.bn.running_mean": torch.zeros(32),
          "module.level1.bn.running_var": torch.ones(32),
          "module.level1.bn.num_batches_tracked": torch.tensor(0),
          "module.level1.act.weight": torch.full((32,), 0.25)}
    p = str(tmp_path / "ckpt.pth")
    torch.save(sd, p)
    merged = espnetv2.load_pretrained(params, p)
    np.testing.assert_allclose(
        np.asarray(merged["net.level1.conv.weight"]),
        w.numpy().transpose(2, 3, 1, 0), rtol=1e-6,
    )


def test_center_feature_extraction():
    from trackmpnn_tpu.data.common import extract_center_features

    fmap = np.arange(2 * 8 * 10, dtype=np.float32).reshape(2, 8, 10)
    boxes = np.array([[0, 0, 4, 4], [8, 6, 10, 8]], np.float32)
    feats = extract_center_features(fmap, boxes, (8, 10), (8, 10), 1)
    assert feats.shape == (2, 2)
    np.testing.assert_allclose(feats[0], fmap[:, 2, 2])


def test_conv_compute_bf16(rng):
    """conv_compute(bf16) contracts in bf16 (MXU path) but keeps f32
    outputs via preferred_element_type; outside the context conv2d is
    exactly the f32 program.  Mirrors nn.matmul_lp's convention for the
    tracker (--embed-bf16 wires this through EmbedTrainer)."""
    x = rng.normal(size=(2, 16, 20, 8)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 8, 16)) * 0.1).astype(np.float32)
    ref = L.conv2d(jnp.asarray(x), jnp.asarray(w))
    assert L.conv_compute_dtype() is None
    with L.conv_compute(jnp.bfloat16):
        assert L.conv_compute_dtype() is jnp.bfloat16
        got = L.conv2d(jnp.asarray(x), jnp.asarray(w))
    assert L.conv_compute_dtype() is None
    assert got.dtype == jnp.float32
    # bf16 mantissa is 8 bits: expect ~1e-2 relative agreement, not equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    assert not np.array_equal(np.asarray(got), np.asarray(ref))


def test_embed_trainer_bf16_learns(tmp_path):
    """EmbedTrainer(conv_dtype='bfloat16') trains: params stay f32, loss
    decreases, and features land near the f32 run's."""
    import cv2

    from test_vis_training import _tiny_chunk
    from trackmpnn_tpu.train.embed import EmbedTrainer

    vis_meta, tids = _tiny_chunk(tmp_path, cv2)
    kw = dict(arch="espv2", num_vis_feats=16, input_hw=(32, 64), max_dets=32,
              seed=11)
    et32 = EmbedTrainer(**kw)
    et16 = EmbedTrainer(**kw, conv_dtype="bfloat16")
    assert jnp.dtype(et16.conv_dtype) == jnp.bfloat16
    assert EmbedTrainer(**kw, conv_dtype="f32").conv_dtype is None
    losses = []
    for _ in range(6):
        f32_feats, _ = et32.train_chunk(vis_meta, tids)
        bf_feats, loss = et16.train_chunk(vis_meta, tids)
        losses.append(loss)
    assert losses[-1] < losses[0]
    for v in et16.params.values():
        assert np.asarray(v).dtype == np.float32
    # same seed, same data: bf16 run tracks the f32 trajectory loosely
    np.testing.assert_allclose(bf_feats, f32_feats, rtol=0.35, atol=0.35)
