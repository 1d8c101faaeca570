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
rematerializes it in backward instead of storing it (HBM relief).

XLA lowers the bilinear gather to serialized per-row dynamic slices
(~14 ns/row on v5e, tools/bench_deform.py), so this file also ships
`deform_conv2d_shift`: a gather-free bounded-offset rewrite (offsets
clamped to +-max_offset, exact within the bound, hand-written scan VJP)
that is 1.8x faster fwd+bwd at max_offset=2 on DLA-34 shapes and is the
from-scratch training default (train/embed.py).  A fused Pallas version
of the same sampling (VMEM-resident shift-sum + MXU contraction, no
gather — the construction this Mosaic toolchain can lower) lives in
ops/pallas_dcn.py, forward-only.  The exact arbitrary-offset
decomposition below remains the default for converted reference
checkpoints; measured comparison in docs/RESULTS.md.

Convention matches torchvision/DCNv2: offset channels ordered
(dy, dx) per tap, taps in row-major (kh, kw) order; sampling outside the
input is zero; mask multiplies the sampled value before the weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.backbones import layers as _L


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
    cols, weight = _L._cast_operands(cols, weight)
    out = jnp.einsum("nhwk,ko->nhwo", cols, weight,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d_shift(x, weight, bias, offset, mask, *, stride=1, padding=1,
                        dilation=1, ksize=3, max_offset=8.0):
    """Gather-free deformable conv: bounded-offset bilinear warp.

    XLA lowers the bilinear 2D gather in `deform_conv2d` to serialized
    per-row dynamic slices (~14 ns/row on v5e — measured in
    tools/bench_deform.py; the same wall as arbitrary scatter).  This
    variant never gathers: offsets are clamped to [-max_offset,
    max_offset] and the bilinear sample is rewritten as a sum over the
    (2R+2)^2 integer shifts the clamped offset can reach,

        sample_k = sum_{u,v} relu(1-|dy_k-u|) * relu(1-|dx_k-v|)
                             * shift(x, base_k + (u, v)),

    where every shift(x, .) is a slice of a zero-padded copy — pure
    vectorized VPU work whose transpose (backward) is shifts again, not
    scatter-adds.  Exactly equal to `deform_conv2d` whenever all offsets
    lie within the bound (pinned in tests/test_deform_dla.py); outside,
    the clamp is part of the op (gradients flow inside the bound).
    Compute scales with (2*max_offset+2)^2: R=2 is 1.8x faster fwd+bwd
    than the gather at DLA-34 shapes, R=4 roughly ties, R=8 loses
    (each term re-streams the image; measured in docs/RESULTS.md).
    """
    N, H, W, Cin = x.shape
    K = ksize
    KK = K * K
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1

    off = offset.reshape(N, Ho, Wo, KK, 2)
    dy = jnp.clip(off[..., 0], -max_offset, max_offset)
    dx = jnp.clip(off[..., 1], -max_offset, max_offset)

    warp = _make_tap_warp(int(np.ceil(max_offset)), stride, padding,
                          dilation, K)
    w3 = weight.reshape(KK, Cin, weight.shape[-1])
    out = jnp.zeros((N, Ho, Wo, w3.shape[-1]), x.dtype)
    for k in range(KK):
        sampled = warp(x, dy[..., k], dx[..., k], k // K, k % K)
        sampled = sampled * mask[..., k, None]
        s_c, w_c = _L._cast_operands(sampled, w3[k])
        out = out + jnp.einsum("nhwc,co->nhwo", s_c, w_c,
                               preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


@functools.lru_cache(maxsize=None)
def _make_tap_warp(R, stride, padding, dilation, ksize=3):
    """Single-tap bounded bilinear warp with a hand-written scan backward.

    Forward scans the (2R+2)^2 integer shifts accumulating
    w(dy,u)*w(dx,v) * shifted-image.  The naive autodiff of that scan
    saves the shifted image per step (O(terms * H*W*C) residuals — OOMs at
    DLA shapes); this custom VJP recomputes each term's slice in a second
    scan whose carries are exactly (d_x, d_dy, d_dx), using that the
    transpose of a shift is the opposite shift — no scatter, O(1)
    residual memory, ~2x forward cost."""

    def pads(H, W, Ho, Wo):
        # ksize comes from the cache key: a local default here silently
        # under-padded (and dynamic_slice silently clamps) for ksize != 3
        span_h = (Ho - 1) * stride + 1
        span_w = (Wo - 1) * stride + 1
        lo = padding + R
        hi_h = max(0, (ksize - 1) * dilation - padding + R + 1 + span_h - H)
        hi_w = max(0, (ksize - 1) * dilation - padding + R + 1 + span_w - W)
        return span_h, span_w, lo, hi_h, hi_w

    shifts = np.arange(-R, R + 2)
    uv_np = np.stack(np.meshgrid(shifts, shifts, indexing="ij"), -1).reshape(-1, 2)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def warp(x, dyk, dxk, kh, kw):
        N, H, W, Cin = x.shape
        _, Ho, Wo = dyk.shape
        span_h, span_w, lo, hi_h, hi_w = pads(H, W, Ho, Wo)
        xp = jnp.pad(x, ((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)))

        def term(acc, s):
            u, v = s[0], s[1]
            ty = kh * dilation - padding + u + lo
            tx = kw * dilation - padding + v + lo
            img = jax.lax.dynamic_slice(
                xp, (0, ty, tx, 0), (N, span_h, span_w, Cin)
            )[:, ::stride, ::stride]
            w2 = (jax.nn.relu(1.0 - jnp.abs(dyk - u))
                  * jax.nn.relu(1.0 - jnp.abs(dxk - v)))
            return acc + w2[..., None] * img, None

        acc, _ = jax.lax.scan(term, jnp.zeros((N, Ho, Wo, Cin), x.dtype),
                              jnp.asarray(uv_np))
        return acc

    def fwd(x, dyk, dxk, kh, kw):
        return warp(x, dyk, dxk, kh, kw), (x, dyk, dxk)

    def bwd(kh, kw, res, g):
        x, dyk, dxk = res
        N, H, W, Cin = x.shape
        _, Ho, Wo = dyk.shape
        span_h, span_w, lo, hi_h, hi_w = pads(H, W, Ho, Wo)
        xp = jnp.pad(x, ((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)))

        def term(carry, s):
            dxp, ddy, ddx = carry
            u, v = s[0], s[1]
            ty = kh * dilation - padding + u + lo
            tx = kw * dilation - padding + v + lo
            ay = 1.0 - jnp.abs(dyk - u)
            ax = 1.0 - jnp.abs(dxk - v)
            wy = jax.nn.relu(ay)
            wx = jax.nn.relu(ax)
            # d_x: unshift w2*g back to the padded grid
            gi = (wy * wx)[..., None] * g
            if stride > 1:
                buf = jnp.zeros((N, span_h, span_w, Cin), g.dtype)
                buf = buf.at[:, ::stride, ::stride].set(gi)
            else:
                buf = gi
            cur = jax.lax.dynamic_slice(
                dxp, (0, ty, tx, 0), (N, span_h, span_w, Cin))
            dxp = jax.lax.dynamic_update_slice(dxp, cur + buf, (0, ty, tx, 0))
            # d_offset: hat-function derivative, only inside the support
            img = jax.lax.dynamic_slice(
                xp, (0, ty, tx, 0), (N, span_h, span_w, Cin)
            )[:, ::stride, ::stride]
            r = jnp.sum(img * g, axis=-1)
            dwy = jnp.where(ay > 0, -jnp.sign(dyk - u), 0.0)
            dwx = jnp.where(ax > 0, -jnp.sign(dxk - v), 0.0)
            ddy = ddy + dwy * wx * r
            ddx = ddx + wy * dwx * r
            return (dxp, ddy, ddx), None

        init = (jnp.zeros_like(xp), jnp.zeros_like(dyk), jnp.zeros_like(dxk))
        (dxp, ddy, ddx), _ = jax.lax.scan(term, init, jnp.asarray(uv_np))
        d_x = dxp[:, lo:lo + H, lo:lo + W, :]
        return d_x, ddy, ddx

    warp.defvjp(fwd, bwd)
    return warp


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


def apply_dcn(params, x, *, stride=1, padding=1, dilation=1, ksize=3,
              max_offset=None):
    """Full DCNv2 op: offset/mask branch + deformable conv.

    The offset conv output layout follows DCNv2: first 2*K*K channels are
    (dy, dx) interleaved per tap, last K*K are mask logits.

    max_offset=None runs the exact arbitrary-offset gather decomposition
    (`deform_conv2d`) — required when loading converted reference
    checkpoints whose offsets are unbounded.  A float bound selects the
    gather-free shifted-warp kernel (`deform_conv2d_shift`): 1.8x faster
    fwd+bwd per layer at max_offset=2; use it when training from
    scratch."""
    om = _L.conv_general_lp(
        x, params["offset_weight"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["offset_bias"]
    kk = ksize * ksize
    offset = om[..., : 2 * kk]
    mask = jax.nn.sigmoid(om[..., 2 * kk :])
    if max_offset is not None:
        return deform_conv2d_shift(x, params["weight"], params["bias"], offset,
                                   mask, stride=stride, padding=padding,
                                   dilation=dilation, ksize=ksize,
                                   max_offset=max_offset)
    return deform_conv2d(x, params["weight"], params["bias"], offset, mask,
                         stride=stride, padding=padding, dilation=dilation,
                         ksize=ksize)
