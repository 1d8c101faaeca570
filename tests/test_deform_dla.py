"""Deformable conv correctness (vs brute-force oracle and vs plain conv at
zero offsets) + DLA-34/DLASeg structure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from trackmpnn_tpu.backbones import deform_conv as DC
from trackmpnn_tpu.backbones import dla


def brute_force_dcn(x, w, b, offset, mask, K=3, pad=1):
    """Loop oracle: x [H,W,C], w [K*K*C, O], offset [Ho,Wo,2KK], mask [Ho,Wo,KK]."""
    H, W, C = x.shape
    O = w.shape[1]
    Ho, Wo = offset.shape[:2]
    out = np.zeros((Ho, Wo, O), np.float64)

    def sample(y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        acc = np.zeros(C)
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xc = y0 + dy, x0 + dx
                wgt = (1 - abs(y - yy)) * (1 - abs(xx - xc))
                if 0 <= yy < H and 0 <= xc < W and wgt > 0:
                    acc += wgt * x[yy, xc]
        return acc

    for oy in range(Ho):
        for ox in range(Wo):
            cols = []
            for kh in range(K):
                for kw in range(K):
                    k = kh * K + kw
                    y = oy - pad + kh + offset[oy, ox, 2 * k]
                    xx = ox - pad + kw + offset[oy, ox, 2 * k + 1]
                    cols.append(sample(y, xx) * mask[oy, ox, k])
            out[oy, ox] = np.concatenate(cols) @ w + b
    return out


def test_deform_conv_matches_bruteforce(rng):
    H, W, C, O = 6, 7, 4, 5
    x = rng.normal(size=(H, W, C)).astype(np.float32)
    w = rng.normal(size=(9 * C, O)).astype(np.float32)
    b = rng.normal(size=O).astype(np.float32)
    offset = (rng.normal(size=(H, W, 18)) * 1.5).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, size=(H, W, 9)).astype(np.float32)
    got = DC.deform_conv2d(jnp.asarray(x[None]), jnp.asarray(w), jnp.asarray(b),
                           jnp.asarray(offset[None]), jnp.asarray(mask[None]))
    want = brute_force_dcn(x, w, b, offset, mask)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-3, atol=1e-4)


def test_deform_conv_zero_offset_is_conv(rng):
    """Zero offsets + unit mask must equal a plain 3x3 conv."""
    H, W, C, O = 8, 8, 3, 6
    x = rng.normal(size=(1, H, W, C)).astype(np.float32)
    w = rng.normal(size=(9 * C, O)).astype(np.float32)
    offset = np.zeros((1, H, W, 18), np.float32)
    mask = np.ones((1, H, W, 9), np.float32)
    got = DC.deform_conv2d(jnp.asarray(x), jnp.asarray(w), None,
                           jnp.asarray(offset), jnp.asarray(mask))
    # reorder to HWIO conv weight: w[k*C + c, o] with k = kh*3+kw
    w_conv = w.reshape(3, 3, C, O)
    tw = torch.tensor(np.asarray(w_conv).transpose(3, 2, 0, 1))
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    want = TF.conv2d(tx, tw, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_dcn_zero_init_behaves_like_conv(rng):
    """init_dcn zero-inits the offset branch, so a fresh DCN == plain conv
    with sigmoid(0)=0.5 mask scaling."""
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    p = DC.init_dcn(jax.random.key(0), 4, 8)
    got = DC.apply_dcn(p, x)
    w_conv = np.asarray(p["weight"]).reshape(3, 3, 4, 8)
    tw = torch.tensor(w_conv.transpose(3, 2, 0, 1))
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    want = 0.5 * TF.conv2d(tx, tw, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_depthwise_conv_transpose_matches_torch(rng):
    for f in (2, 4):
        C = 3
        x = rng.normal(size=(1, 5, 6, C)).astype(np.float32)
        w = rng.normal(size=(2 * f, 2 * f, 1, C)).astype(np.float32)
        got = dla.depthwise_conv_transpose(jnp.asarray(x), jnp.asarray(w), f)
        tw = torch.tensor(w.transpose(3, 2, 0, 1))  # (C, 1, k, k)
        tx = torch.tensor(x.transpose(0, 3, 1, 2))
        want = TF.conv_transpose2d(tx, tw, stride=f, padding=f // 2, groups=C)
        np.testing.assert_allclose(np.asarray(got),
                                   want.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-4)
        assert got.shape[1] == 5 * f and got.shape[2] == 6 * f


def test_bilinear_up_kernel_interpolates():
    w = dla.bilinear_up_kernel(2)
    assert w.shape == (4, 4)
    assert np.isclose(w.max(), (0.75) ** 2)


def test_dla_checkpoint_merge(tmp_path):
    params = dla.init_dlaseg(jax.random.key(0), {"trk": 8}, head_conv=16)
    w_conv = torch.randn(16, 3, 7, 7)          # base_layer conv
    w_dcn = torch.randn(64, 512, 3, 3)         # dla_up.ida_0.proj_1 DCN main
    key_dcn = "dla_up.ida_0.proj_1.conv.weight"
    sd = {"base_layer.0.weight": w_conv, key_dcn: w_dcn,
          "base_layer.1.weight": torch.ones(16)}
    # shapes must match the fresh params for the test keys
    assert params["base.base_layer.0.weight"].shape == (7, 7, 3, 16)
    kk_i, o = params[key_dcn].shape
    w_dcn = torch.randn(o, kk_i // 9, 3, 3)
    sd[key_dcn] = w_dcn
    p = str(tmp_path / "dla.pth")
    torch.save(sd, p)
    merged = dla.load_pretrained(params, p, strip_prefix="module.")
    np.testing.assert_allclose(np.asarray(merged["base.base_layer.0.weight"]),
                               w_conv.numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    want = w_dcn.numpy().transpose(2, 3, 1, 0).reshape(-1, o)
    np.testing.assert_allclose(np.asarray(merged[key_dcn]), want, rtol=1e-6)


def test_dlaseg_shapes():
    params = dla.init_dlaseg(jax.random.key(0), {"trk": 16}, head_conv=32)
    x = jnp.zeros((1, 64, 64, 3))
    out = jax.jit(lambda p, x: dla.apply_dlaseg(p, x, {"trk": 16}, head_conv=32))(params, x)
    assert out["trk"].shape == (1, 16, 16, 16)  # down_ratio 4
    assert bool(jnp.all(jnp.isfinite(out["trk"])))


# ---------------------------------------------- gather-free shifted warp ----
@pytest.mark.parametrize("cfg", [(9, 11, 8, 6, 1, 1, 1), (12, 10, 4, 8, 2, 1, 1),
                                 (13, 13, 8, 4, 1, 2, 2)])
def test_shift_warp_matches_gather(rng, cfg):
    """deform_conv2d_shift == deform_conv2d whenever offsets are in bound,
    for values AND gradients (the shift path has a hand-written scan VJP)."""
    H, W, Cin, Cout, stride, pad, dil = cfg
    K = 3
    Ho = (H + 2 * pad - dil * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * pad - dil * (K - 1) - 1) // stride + 1
    x = jnp.asarray(rng.normal(size=(2, H, W, Cin)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(9 * Cin, Cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    off = rng.uniform(-3.9, 3.9, size=(2, Ho, Wo, 18))
    # keep offsets off integer values so the hat subgradient is unambiguous
    off = jnp.asarray(np.where(np.abs(off - np.round(off)) < 0.05, off + 0.1,
                               off).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0.2, 1, size=(2, Ho, Wo, 9)).astype(np.float32))

    kw = dict(stride=stride, padding=pad, dilation=dil)
    ref = DC.deform_conv2d(x, wgt, b, off, msk, **kw)
    got = DC.deform_conv2d_shift(x, wgt, b, off, msk, max_offset=4.0, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    f1 = lambda x_, w_, o_, m_: jnp.sum(jnp.cos(DC.deform_conv2d(x_, w_, b, o_, m_, **kw)))
    f2 = lambda x_, w_, o_, m_: jnp.sum(jnp.cos(
        DC.deform_conv2d_shift(x_, w_, b, o_, m_, max_offset=4.0, **kw)))
    g1 = jax.grad(f1, (0, 1, 2, 3))(x, wgt, off, msk)
    g2 = jax.grad(f2, (0, 1, 2, 3))(x, wgt, off, msk)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-3, atol=2e-4)


def test_apply_dcn_shift_through_offset_conv(rng):
    """max_offset= on the full DCNv2 op: grads through the offset/mask conv
    match the gather path while every produced offset is inside the bound."""
    H, W, Cin, Cout = 10, 12, 6, 5
    x = jnp.asarray(rng.normal(size=(2, H, W, Cin)).astype(np.float32))
    params = DC.init_dcn(jax.random.key(0), Cin, Cout)
    params["offset_weight"] = 0.02 * jax.random.normal(
        jax.random.key(1), params["offset_weight"].shape)
    h1 = lambda p: jnp.sum(jnp.sin(DC.apply_dcn(p, x)))
    h2 = lambda p: jnp.sum(jnp.sin(DC.apply_dcn(p, x, max_offset=6.0)))
    d1, d2 = jax.grad(h1)(params), jax.grad(h2)(params)
    for k in d1:
        np.testing.assert_allclose(np.asarray(d2[k]), np.asarray(d1[k]),
                                   rtol=1e-3, atol=1e-4)


def test_shift_warp_ksize5(rng):
    """Regression: _make_tap_warp's pad math must use the caller's ksize
    (a hardcoded K=3 under-padded and dynamic_slice silently clamped,
    sampling wrong rows for ksize != 3)."""
    H, W, Cin, Cout, K = 12, 11, 4, 5, 5
    pad = 2
    Ho = (H + 2 * pad - (K - 1) - 1) // 1 + 1
    Wo = (W + 2 * pad - (K - 1) - 1) // 1 + 1
    x = jnp.asarray(rng.normal(size=(1, H, W, Cin)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(K * K * Cin, Cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    off = rng.uniform(-1.9, 1.9, size=(1, Ho, Wo, 2 * K * K))
    off = jnp.asarray(np.where(np.abs(off - np.round(off)) < 0.05, off + 0.1,
                               off).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0.2, 1, size=(1, Ho, Wo, K * K)).astype(np.float32))
    kw = dict(stride=1, padding=pad, dilation=1, ksize=K)
    ref = DC.deform_conv2d(x, wgt, b, off, msk, **kw)
    got = DC.deform_conv2d_shift(x, wgt, b, off, msk, max_offset=2.0, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
