"""Modulated deformable convolution v2, TPU-native.

Replaces the reference's sole native CUDA component (DCNv2, imported at
/root/reference/models/dla/pose_dla_dcn.py:16, compiled per README.md:20-26).
CUDA does not exist on TPU; the TPU-native decomposition is:

  1. offset/mask branch: a regular 3x3 conv producing per-position offsets
     (2*K*K) and modulation masks (K*K, sigmoid) - pure MXU conv;
  2. sampling: bilinear gather of the input at the K*K deformed taps -
     4 gathers + lerp on the VPU, vectorized over all positions;
  3. contraction: the sampled [*, K*K*Cin] columns hit the weights as one
     big matmul - exactly the MXU's shape.

The im2col intermediate is K*K x input size; `jax.checkpoint` on the caller
rematerializes it in backward instead of storing it (HBM relief).  A fully
fused Pallas kernel is deliberately NOT used: bilinear sampling is a
vectorized dynamic gather, which this Mosaic toolchain does not lower
(established in ops/pallas_mp.py; see CLAUDE.md), and the per-row
dynamic-slice fallback would serialize ~Ho*Wo*K*K rows.  This XLA
decomposition is the production kernel; see tests/test_deform_dla.py for
its brute-force oracles and bench notes in docs/RESULTS.md.

Convention matches torchvision/DCNv2: offset channels ordered
(dy, dx) per tap, taps in row-major (kh, kw) order; sampling outside the
input is zero; mask multiplies the sampled value before the weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(x, ys, xs):
    """x: [H, W, C]; ys/xs: [...] float sample coords.  Zero padding outside.

    Returns [..., C]."""
    H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = x[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


def deform_conv2d(x, weight, bias, offset, mask, *, stride=1, padding=1,
                  dilation=1, ksize=3):
    """x: [N, H, W, Cin]; weight: [K*K*Cin, Cout]; bias: [Cout];
    offset: [N, Ho, Wo, 2*K*K] as (dy, dx) pairs; mask: [N, Ho, Wo, K*K]
    (already sigmoided).  Returns [N, Ho, Wo, Cout]."""
    N, H, W, Cin = x.shape
    K = ksize
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1

    # base tap grid per output position
    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    ky = jnp.arange(K) * dilation
    kx = jnp.arange(K) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # [Ho,1,K,1]
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # [1,Wo,1,K]
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, K, K)).reshape(Ho, Wo, K * K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, K, K)).reshape(Ho, Wo, K * K)

    off = offset.reshape(N, Ho, Wo, K * K, 2)
    ys = base_y[None] + off[..., 0]
    xs = base_x[None] + off[..., 1]

    def per_image(xi, yi, xj, mi):
        cols = bilinear_sample(xi, yi, xj)            # [Ho, Wo, K*K, Cin]
        cols = cols * mi[..., None]
        return cols.reshape(Ho, Wo, K * K * Cin)

    cols = jax.vmap(per_image)(x, ys, xs, mask)
    out = jnp.einsum("nhwk,ko->nhwo", cols, weight,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def init_dcn(key, cin, cout, ksize=3):
    """DCN block params: offset/mask conv (zero-init, the DCNv2 convention -
    training starts as a regular conv) + main weights (kaiming fan_out)."""
    k1 = key
    fan_out = ksize * ksize * cout
    std = np.sqrt(2.0 / fan_out)
    return {
        "weight": std * jax.random.normal(k1, (ksize * ksize * cin, cout)),
        "bias": jnp.zeros((cout,)),
        "offset_weight": jnp.zeros((ksize, ksize, cin, 3 * ksize * ksize)),
        "offset_bias": jnp.zeros((3 * ksize * ksize,)),
    }


def apply_dcn(params, x, *, stride=1, padding=1, dilation=1, ksize=3):
    """Full DCNv2 op: offset/mask branch + deformable conv.

    The offset conv output layout follows DCNv2: first 2*K*K channels are
    (dy, dx) interleaved per tap, last K*K are mask logits."""
    om = jax.lax.conv_general_dilated(
        x, params["offset_weight"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["offset_bias"]
    kk = ksize * ksize
    offset = om[..., : 2 * kk]
    mask = jax.nn.sigmoid(om[..., 2 * kk :])
    return deform_conv2d(x, params["weight"], params["bias"], offset, mask,
                         stride=stride, padding=padding, dilation=dilation,
                         ksize=ksize)
