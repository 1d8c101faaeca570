"""Pure-torch modulated deformable convolution (DCNv2) oracle.

The reference's only native component is the compiled DCNv2 CUDA extension
(imported at /root/reference/models/dla/pose_dla_dcn.py:16, not vendored).
This module reimplements its exact math in plain differentiable torch ops
so the reference's DLASeg can run on CPU for whole-network activation
parity tests: the `DCN` class mirrors the extension's module interface
(state_dict keys `weight`, `bias`, `conv_offset_mask.*`; offset layout
dy/dx interleaved per tap after the o1/o2/mask chunk+cat, which is an
identity reordering; zero-init offset branch).

Inject it as `models.dla.DCNv2.dcn_v2` in sys.modules before importing
the reference's pose_dla_dcn (see test_backbone_parity.py).
"""

import torch
import torch.nn as nn


def modulated_deform_conv2d(x, offset, mask, weight, bias, stride=1,
                            padding=1, dilation=1):
    """x: [N,C,H,W]; offset: [N,2*K*K,Ho,Wo] (dy,dx per tap, row-major
    taps); mask: [N,K*K,Ho,Wo] (already sigmoided); weight: [O,I,K,K].
    Bilinear sampling with zero outside the input."""
    N, C, H, W = x.shape
    O, I, kh, kw = weight.shape
    KK = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    oy = torch.arange(Ho, dtype=x.dtype) * stride - padding
    ox = torch.arange(Wo, dtype=x.dtype) * stride - padding
    ky = torch.arange(kh, dtype=x.dtype) * dilation
    kx = torch.arange(kw, dtype=x.dtype) * dilation
    base_y = (oy[:, None, None, None] + ky[None, None, :, None]).expand(Ho, Wo, kh, kw)
    base_x = (ox[None, :, None, None] + kx[None, None, None, :]).expand(Ho, Wo, kh, kw)
    base_y = base_y.reshape(1, Ho, Wo, KK)
    base_x = base_x.reshape(1, Ho, Wo, KK)

    off = offset.permute(0, 2, 3, 1).reshape(N, Ho, Wo, KK, 2)
    ys = base_y + off[..., 0]
    xs = base_x + off[..., 1]

    y0 = torch.floor(ys)
    x0 = torch.floor(xs)
    wy = (ys - y0).unsqueeze(-1)
    wx = (xs - x0).unsqueeze(-1)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = yi.clamp(0, H - 1).long()
        xc = xi.clamp(0, W - 1).long()
        flat = (yc * W + xc).reshape(N, -1)                       # [N, Ho*Wo*KK]
        v = torch.gather(
            x.reshape(N, C, H * W), 2,
            flat.unsqueeze(1).expand(N, C, flat.shape[1]))
        v = v.reshape(N, C, Ho, Wo, KK).permute(0, 2, 3, 4, 1)    # [N,Ho,Wo,KK,C]
        return v * valid.unsqueeze(-1).to(x.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    samp = ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)                # [N,Ho,Wo,KK,C]
    samp = samp * mask.permute(0, 2, 3, 1).unsqueeze(-1)
    cols = samp.reshape(N, Ho, Wo, KK * C)                        # (tap, chan)
    w2 = weight.permute(2, 3, 1, 0).reshape(KK * C, O)            # (ky,kx,i) rows
    out = cols @ w2
    if bias is not None:
        out = out + bias
    return out.permute(0, 3, 1, 2)


class DCN(nn.Module):
    """Drop-in for DCNv2's `DCN(chi, cho, kernel_size, stride, padding,
    dilation, deformable_groups)` module (deformable_groups=1 only)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=1, dilation=1, deformable_groups=1):
        super().__init__()
        assert deformable_groups == 1
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        kh, kw = kernel_size
        self.weight = nn.Parameter(torch.empty(out_channels, in_channels, kh, kw))
        self.bias = nn.Parameter(torch.zeros(out_channels))
        n = in_channels * kh * kw
        stdv = 1.0 / (n ** 0.5)
        self.weight.data.uniform_(-stdv, stdv)
        self.conv_offset_mask = nn.Conv2d(
            in_channels, 3 * kh * kw, kernel_size=kernel_size, stride=stride,
            padding=padding, bias=True)
        self.conv_offset_mask.weight.data.zero_()
        self.conv_offset_mask.bias.data.zero_()

    def forward(self, x):
        out = self.conv_offset_mask(x)
        o1, o2, m = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)  # identity reorder (DCNv2 code)
        mask = torch.sigmoid(m)
        return modulated_deform_conv2d(x, offset, mask, self.weight, self.bias,
                                       self.stride, self.padding, self.dilation)
