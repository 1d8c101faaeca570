"""ESPNetv2 segmentation backbone in JAX (the 'espv2' appearance-embedding
network, behavioral spec /root/reference/models/espv2/*).

Produces a `classes`-channel embedding map at full input resolution
(down_ratio=1); the tracker samples it at detection centers.  Structure:

  EESP block: 1x1 grouped reduce -> k parallel depthwise dilated 3x3
  branches -> hierarchical additive fusion -> BN+PReLU -> 1x1 grouped
  expand (+residual, PReLU) (Model.py:11-96).
  DownSampler: stride-2 'avg'-mode EESP || 3x3 avg-pool, concatenated,
  plus repeated-avg-pooled RGB input reinforcement (Model.py:98-143).
  Seg head: L4->L3 projection + PSP module + staged bilinear upsampling
  with L2/L1 skip projections (SegmentationModel.py:39-69).

Params are a flat dict with torch-style keys, so the published ImageNet
checkpoint (espnetv2_s_1.0.pth) loads via
backbones.layers.convert_torch_state_dict.  Layout NHWC throughout.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from trackmpnn_tpu.backbones import layers as L

RECEPTIVE_DILATION = {3: 1, 5: 2, 7: 3, 9: 4, 11: 5, 13: 6, 15: 7, 17: 8}


def _eesp_ksizes(k: int, r_lim: int):
    ks = []
    for i in range(k):
        size = 3 + 2 * i
        ks.append(size if size <= r_lim else 3)
    return sorted(ks)


def espnet_config(s: float = 1.0):
    base, K = 32, 4
    base_s = math.ceil(int(base * s) / K) * K
    c0 = base if base_s > base else base_s
    config = [c0] + [base_s * (2 ** i) for i in range(1, 5)]
    config.append(1024 if s <= 1.5 else 1280)
    return config


# ------------------------------------------------------------ EESP block ----
def init_eesp(params, key, name, n_in, n_out, k=4, r_lim=7):
    n = n_out // k
    keys = jax.random.split(key, k + 2)
    L.add_conv(params, keys[0], f"{name}.proj_1x1.conv", n_in, n, 1, groups=k)
    L.add_bn(params, f"{name}.proj_1x1.bn", n)
    L.add_prelu(params, f"{name}.proj_1x1.act", n)
    for i, ks in enumerate(_eesp_ksizes(k, r_lim)):
        L.add_conv(params, keys[i + 1], f"{name}.spp_dw.{i}.conv", n, n, 3, groups=n)
    L.add_conv(params, keys[-1], f"{name}.conv_1x1_exp.conv", n_out, n_out, 1, groups=k)
    L.add_bn(params, f"{name}.conv_1x1_exp.bn", n_out)
    L.add_bn(params, f"{name}.br_after_cat.bn", n_out)
    L.add_prelu(params, f"{name}.br_after_cat.act", n_out)
    L.add_prelu(params, f"{name}.module_act", n_out)


def apply_eesp(params, name, x, n_out, stride=1, k=4, r_lim=7, down_avg=False, train=False):
    n = n_out // k
    red = L.apply_cbr(params, f"{name}.proj_1x1", x, groups=k, train=train)
    outs = []
    for i, ks in enumerate(_eesp_ksizes(k, r_lim)):
        d = RECEPTIVE_DILATION[ks]
        b = L.conv2d(red, params[f"{name}.spp_dw.{i}.conv.weight"], stride=stride,
                     dilation=d, groups=n)
        if outs:
            b = b + outs[-1]  # hierarchical feature fusion
        outs.append(b)
    cat = jnp.concatenate(outs, axis=-1)
    cat = L.apply_br(params, f"{name}.br_after_cat", cat, train)
    expanded = L.apply_cb(params, f"{name}.conv_1x1_exp", cat, groups=k, train=train)
    if stride == 2 and down_avg:
        return expanded
    if expanded.shape == x.shape:
        expanded = expanded + x
    return L.prelu(expanded, params[f"{name}.module_act.weight"])


# ------------------------------------------------------------ DownSampler ----
def init_downsampler(params, key, name, n_in, n_out, k=4, r_lim=9, reinf=True):
    k1, k2, k3 = jax.random.split(key, 3)
    init_eesp(params, k1, f"{name}.eesp", n_in, n_out - n_in, k=k, r_lim=r_lim)
    if reinf:
        L.add_conv(params, k2, f"{name}.inp_reinf.0.conv", 3, 3, 3)
        L.add_bn(params, f"{name}.inp_reinf.0.bn", 3)
        L.add_prelu(params, f"{name}.inp_reinf.0.act", 3)
        L.add_conv(params, k3, f"{name}.inp_reinf.1.conv", 3, n_out, 1)
        L.add_bn(params, f"{name}.inp_reinf.1.bn", n_out)
    L.add_prelu(params, f"{name}.act", n_out)


def apply_downsampler(params, name, x, rgb, n_in, n_out, k=4, r_lim=9, train=False):
    avg = L.avg_pool2d(x, 3, 2, 1)
    eesp = apply_eesp(params, f"{name}.eesp", x, n_out - n_in, stride=2, k=k,
                      r_lim=r_lim, down_avg=True, train=train)
    out = jnp.concatenate([avg, eesp], axis=-1)
    if rgb is not None:
        r = rgb
        while r.shape[1] != avg.shape[1]:
            r = L.avg_pool2d(r, 3, 2, 1)
        r = L.apply_cbr(params, f"{name}.inp_reinf.0", r, train=train)
        r = L.apply_cb(params, f"{name}.inp_reinf.1", r, train=train)
        out = out + r
    return L.prelu(out, params[f"{name}.act.weight"])


# ------------------------------------------------------------- full model ----
REPS = [0, 3, 7, 3]
R_LIMS = [13, 11, 9, 7, 5]


def init_espnetv2_seg(key, classes: int = 128, s: float = 1.0) -> Dict:
    cfg = espnet_config(s)
    params: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 64))
    # backbone levels 1-4 (level5 is deleted by the seg model,
    # SegmentationModel.py:31-33)
    L.add_conv(params, next(keys), "net.level1.conv", 3, cfg[0], 3)
    L.add_bn(params, "net.level1.bn", cfg[0])
    L.add_prelu(params, "net.level1.act", cfg[0])
    init_downsampler(params, next(keys), "net.level2_0", cfg[0], cfg[1], r_lim=R_LIMS[0])
    init_downsampler(params, next(keys), "net.level3_0", cfg[1], cfg[2], r_lim=R_LIMS[1])
    for i in range(REPS[1]):
        init_eesp(params, next(keys), f"net.level3.{i}", cfg[2], cfg[2], r_lim=R_LIMS[2])
    init_downsampler(params, next(keys), "net.level4_0", cfg[2], cfg[3], r_lim=R_LIMS[2])
    for i in range(REPS[2]):
        init_eesp(params, next(keys), f"net.level4.{i}", cfg[3], cfg[3], r_lim=R_LIMS[3])

    # segmentation head (SegmentationModel.py:39-46)
    L.add_conv(params, next(keys), "proj_L4_C.conv", cfg[3], cfg[2], 1)
    L.add_bn(params, "proj_L4_C.bn", cfg[2])
    L.add_prelu(params, "proj_L4_C.act", cfg[2])
    psp_size = 2 * cfg[2]
    init_eesp(params, next(keys), "pspMod.0", psp_size, psp_size // 2, k=4, r_lim=7)
    # PSP module: 4 depthwise 3x3 stages + 1x1 projection (cnn_utils.py:11-25)
    for i in range(4):
        L.add_conv(params, next(keys), f"pspMod.1.stages.{i}.conv",
                   psp_size // 2, psp_size // 2, 3, groups=psp_size // 2)
    L.add_conv(params, next(keys), "pspMod.1.project.conv",
               psp_size // 2 * 5, psp_size // 2, 1)
    L.add_bn(params, "pspMod.1.project.bn", psp_size // 2)
    L.add_prelu(params, "pspMod.1.project.act", psp_size // 2)
    L.add_conv(params, next(keys), "project_l3.1.conv", psp_size // 2, classes, 1)
    L.add_bn(params, "act_l3.bn", classes)
    L.add_prelu(params, "act_l3.act", classes)
    L.add_conv(params, next(keys), "project_l2.conv", cfg[1] + classes, classes, 1)
    L.add_bn(params, "project_l2.bn", classes)
    L.add_prelu(params, "project_l2.act", classes)
    L.add_conv(params, next(keys), "project_l1.1.conv", cfg[0] + classes, classes, 1)
    return params


def apply_psp(params, name, x, train=False):
    h, w = x.shape[1], x.shape[2]
    outs = [x]
    feats = x
    c = x.shape[-1]
    for i in range(4):
        feats = L.avg_pool2d(feats, 3, 2, 1)
        st = L.conv2d(feats, params[f"{name}.stages.{i}.conv.weight"], groups=c)
        outs.append(L.resize_bilinear_align_corners(st, h, w))
    return L.apply_cbr(params, f"{name}.project", jnp.concatenate(outs, -1), train=train)


def apply_espnetv2_seg(params, x, s: float = 1.0, train: bool = False,
                       drop_rng=None):
    """x: NHWC RGB (normalized).  Returns [N, H, W, classes] at input res."""
    cfg = espnet_config(s)
    rgb = x
    l1 = L.apply_cbr(params, "net.level1", x, stride=2, train=train)
    l2 = apply_downsampler(params, "net.level2_0", l1, rgb, cfg[0], cfg[1],
                           r_lim=R_LIMS[0], train=train)
    l3 = apply_downsampler(params, "net.level3_0", l2, rgb, cfg[1], cfg[2],
                           r_lim=R_LIMS[1], train=train)
    for i in range(REPS[1]):
        l3 = apply_eesp(params, f"net.level3.{i}", l3, cfg[2], r_lim=R_LIMS[2], train=train)
    l4 = apply_downsampler(params, "net.level4_0", l3, rgb, cfg[2], cfg[3],
                           r_lim=R_LIMS[2], train=train)
    for i in range(REPS[2]):
        l4 = apply_eesp(params, f"net.level4.{i}", l4, cfg[3], r_lim=R_LIMS[3], train=train)

    l4p = L.apply_cbr(params, "proj_L4_C", l4, train=train)
    up4 = L.upsample2x(l4p)
    psp_size = 2 * cfg[2]
    m3 = apply_eesp(params, "pspMod.0", jnp.concatenate([l3, up4], -1),
                    psp_size // 2, r_lim=7, train=train)
    m3 = apply_psp(params, "pspMod.1", m3, train)
    if train and drop_rng is not None:
        keep = jax.random.bernoulli(drop_rng, 0.8, (m3.shape[0], 1, 1, m3.shape[-1]))
        m3 = m3 * keep / 0.8  # Dropout2d p=0.2
    p3 = L.conv2d(m3, params["project_l3.1.conv.weight"])
    a3 = L.apply_br(params, "act_l3", p3, train)
    up3 = L.upsample2x(a3)
    m2 = L.apply_cbr(params, "project_l2", jnp.concatenate([l2, up3], -1), train=train)
    up2 = L.upsample2x(m2)
    m1 = jnp.concatenate([l1, up2], -1)
    if train and drop_rng is not None:
        keep = jax.random.bernoulli(jax.random.fold_in(drop_rng, 1), 0.8,
                                    (m1.shape[0], 1, 1, m1.shape[-1]))
        m1 = m1 * keep / 0.8
    out = L.conv2d(m1, params["project_l1.1.conv.weight"])
    return L.upsample2x(out)


def load_pretrained(params: Dict, path: str) -> Dict:
    """Merge a torch EESPNet/EESPNet_Seg checkpoint into our flat params.

    The classification checkpoint's keys lack the 'net.' prefix and carry
    'module.' (DataParallel); both are normalized.  Missing head keys keep
    their fresh init (the seg head is trained from scratch, as in the
    reference)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    flat = L.convert_torch_state_dict(sd)
    merged = dict(params)
    hits = 0
    for k, v in flat.items():
        for cand in (k, "net." + k):
            if cand in merged and merged[cand].shape == v.shape:
                merged[cand] = v
                hits += 1
                break
    if hits == 0:
        raise ValueError(f"no overlapping weights found in {path}")
    return merged
