"""DLA-34 with deformable-conv upsampling (the 'dla34' embedding backbone).

Behavioral spec: /root/reference/models/dla/pose_dla_dcn.py - DLA-34 base
(hierarchical trees of BasicBlocks), DLAUp/IDAUp iterative deep aggregation
where every projection/node is a DeformConv (DCNv2 + BN + ReLU,
pose_dla_dcn.py:345-357) and upsampling is a depthwise transposed conv with
bilinear-init weights (fill_up_weights, pose_dla_dcn.py:332-341), plus
configurable heads ('trk' for the 128-d embedding map).

The deformable conv is the TPU-native op in backbones/deform_conv.py
(replacing the reference's external CUDA DCNv2).  Params are a flat dict
with torch-style keys for checkpoint conversion.  Layout NHWC.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.backbones import layers as L
from trackmpnn_tpu.backbones import deform_conv as DC

DLA34_LEVELS = [1, 1, 1, 2, 2, 1]
DLA34_CHANNELS = [16, 32, 64, 128, 256, 512]


# ------------------------------------------------------------- primitives --
def add_plain_conv(params, key, name, cin, cout, k, groups=1):
    params[f"{name}.weight"] = L.conv_init(key, k, cin // groups, cout)


def add_plain_bn(params, name, c):
    params[f"{name}.weight"] = jnp.ones((c,))
    params[f"{name}.bias"] = jnp.zeros((c,))
    params[f"{name}.running_mean"] = jnp.zeros((c,))
    params[f"{name}.running_var"] = jnp.ones((c,))


def conv_bn_relu(params, conv_name, bn_name, x, stride=1, dilation=1, relu=True,
                 train=False):
    x = L.conv2d(x, params[f"{conv_name}.weight"], stride=stride, dilation=dilation)
    x = L.bn2d(params, bn_name, x, train)
    return jax.nn.relu(x) if relu else x


def max_pool2d(x, k, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)],
    )


def bilinear_up_kernel(f: int) -> np.ndarray:
    """fill_up_weights' bilinear kernel for a (2f x 2f) stride-f up-conv."""
    k = 2 * f
    fc = math.ceil(k / 2)
    c = (2 * fc - 1 - fc % 2) / (2.0 * fc)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / fc - c)) * (1 - abs(j / fc - c))
    return w


def depthwise_conv_transpose(x, w, f: int):
    """torch ConvTranspose2d(o, o, 2f, stride=f, padding=f//2, groups=o)
    as a fractionally-strided depthwise conv: lhs_dilation=f with the kernel
    spatially flipped; w: [2f, 2f, 1, C]."""
    k = 2 * f
    pad = k - 1 - f // 2
    wf = w[::-1, ::-1]
    return L.conv_general_lp(
        x, wf,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(f, f),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


# ------------------------------------------------------------ basic block --
def init_basic_block(params, key, name, cin, cout):
    k1, k2 = jax.random.split(key)
    add_plain_conv(params, k1, f"{name}.conv1", cin, cout, 3)
    add_plain_bn(params, f"{name}.bn1", cout)
    add_plain_conv(params, k2, f"{name}.conv2", cout, cout, 3)
    add_plain_bn(params, f"{name}.bn2", cout)


def apply_basic_block(params, name, x, residual, stride=1, train=False):
    out = conv_bn_relu(params, f"{name}.conv1", f"{name}.bn1", x, stride=stride,
                       train=train)
    out = conv_bn_relu(params, f"{name}.conv2", f"{name}.bn2", out, relu=False,
                       train=train)
    return jax.nn.relu(out + residual)


# ------------------------------------------------------------------- tree --
def init_tree(params, key, name, levels, cin, cout, level_root=False, root_dim=0):
    if root_dim == 0:
        root_dim = 2 * cout
    if level_root:
        root_dim += cin
    keys = jax.random.split(key, 5)
    if levels == 1:
        init_basic_block(params, keys[0], f"{name}.tree1", cin, cout)
        init_basic_block(params, keys[1], f"{name}.tree2", cout, cout)
        add_plain_conv(params, keys[2], f"{name}.root.conv", root_dim, cout, 1)
        add_plain_bn(params, f"{name}.root.bn", cout)
    else:
        init_tree(params, keys[0], f"{name}.tree1", levels - 1, cin, cout)
        init_tree(params, keys[1], f"{name}.tree2", levels - 1, cout, cout,
                  root_dim=root_dim + cout)
    if cin != cout:
        add_plain_conv(params, keys[3], f"{name}.project.0", cin, cout, 1)
        add_plain_bn(params, f"{name}.project.1", cout)


def apply_tree(params, name, x, levels, cin, cout, stride=1, level_root=False,
               children=None, residual=None, train=False):
    children = [] if children is None else children
    bottom = max_pool2d(x, stride, stride) if stride > 1 else x
    if cin != cout:
        res = conv_bn_relu(params, f"{name}.project.0", f"{name}.project.1",
                           bottom, relu=False, train=train)
    else:
        res = bottom
    if level_root:
        children.append(bottom)
    x1 = apply_tree(params, f"{name}.tree1", x, levels - 1, cin, cout,
                    stride=stride, residual=res, train=train) \
        if levels > 1 else \
        apply_basic_block(params, f"{name}.tree1", x, res, stride=stride, train=train)
    if levels == 1:
        x2 = apply_basic_block(params, f"{name}.tree2", x1, x1, train=train)
        cat = jnp.concatenate([x2, x1] + children, axis=-1)
        out = conv_bn_relu(params, f"{name}.root.conv", f"{name}.root.bn", cat,
                           relu=False, train=train)
        return jax.nn.relu(out)
    children.append(x1)
    return apply_tree(params, f"{name}.tree2", x1, levels - 1, cout, cout,
                      children=children, train=train)


# ------------------------------------------------------------------- base --
def init_dla34_base(params, key):
    ch = DLA34_CHANNELS
    keys = jax.random.split(key, 8)
    add_plain_conv(params, keys[0], "base.base_layer.0", 3, ch[0], 7)
    add_plain_bn(params, "base.base_layer.1", ch[0])
    add_plain_conv(params, keys[1], "base.level0.0", ch[0], ch[0], 3)
    add_plain_bn(params, "base.level0.1", ch[0])
    add_plain_conv(params, keys[2], "base.level1.0", ch[0], ch[1], 3)
    add_plain_bn(params, "base.level1.1", ch[1])
    init_tree(params, keys[3], "base.level2", 1, ch[1], ch[2])
    init_tree(params, keys[4], "base.level3", 2, ch[2], ch[3], level_root=True)
    init_tree(params, keys[5], "base.level4", 2, ch[3], ch[4], level_root=True)
    init_tree(params, keys[6], "base.level5", 1, ch[4], ch[5], level_root=True)


def apply_dla34_base(params, x, train=False) -> List:
    ch = DLA34_CHANNELS
    x = conv_bn_relu(params, "base.base_layer.0", "base.base_layer.1", x, train=train)
    y = []
    x = conv_bn_relu(params, "base.level0.0", "base.level0.1", x, train=train)
    y.append(x)
    x = conv_bn_relu(params, "base.level1.0", "base.level1.1", x, stride=2, train=train)
    y.append(x)
    x = apply_tree(params, "base.level2", x, 1, ch[1], ch[2], stride=2, train=train)
    y.append(x)
    x = apply_tree(params, "base.level3", x, 2, ch[2], ch[3], stride=2,
                   level_root=True, train=train)
    y.append(x)
    x = apply_tree(params, "base.level4", x, 2, ch[3], ch[4], stride=2,
                   level_root=True, train=train)
    y.append(x)
    x = apply_tree(params, "base.level5", x, 1, ch[4], ch[5], stride=2,
                   level_root=True, train=train)
    y.append(x)
    return y


# --------------------------------------------------------------- IDA / up --
def init_deform_block(params, key, name, cin, cout):
    dcn = DC.init_dcn(key, cin, cout)
    params[f"{name}.conv.weight"] = dcn["weight"]
    params[f"{name}.conv.bias"] = dcn["bias"]
    params[f"{name}.conv.conv_offset_mask.weight"] = dcn["offset_weight"]
    params[f"{name}.conv.conv_offset_mask.bias"] = dcn["offset_bias"]
    add_plain_bn(params, f"{name}.actf.0", cout)


def apply_deform_block(params, name, x, train=False, dcn_max_offset=None):
    p = {
        "weight": params[f"{name}.conv.weight"],
        "bias": params[f"{name}.conv.bias"],
        "offset_weight": params[f"{name}.conv.conv_offset_mask.weight"],
        "offset_bias": params[f"{name}.conv.conv_offset_mask.bias"],
    }
    x = DC.apply_dcn(p, x, max_offset=dcn_max_offset)
    x = L.bn2d(params, f"{name}.actf.0", x, train)
    return jax.nn.relu(x)


def init_ida_up(params, key, name, o, channels, up_f):
    keys = jax.random.split(key, 2 * len(channels))
    for i in range(1, len(channels)):
        init_deform_block(params, keys[2 * i - 2], f"{name}.proj_{i}", channels[i], o)
        init_deform_block(params, keys[2 * i - 1], f"{name}.node_{i}", o, o)
        f = int(up_f[i])
        w = bilinear_up_kernel(f)[:, :, None, None] * np.ones((1, 1, 1, o), np.float32)
        params[f"{name}.up_{i}.weight"] = jnp.asarray(w)  # [2f, 2f, 1, o]


def apply_ida_up(params, name, layers, startp, endp, train=False,
                 dcn_max_offset=None):
    for i in range(startp + 1, endp):
        r = i - startp
        f = params[f"{name}.up_{r}.weight"].shape[0] // 2  # static: kernel = 2f
        x = apply_deform_block(params, f"{name}.proj_{r}", layers[i], train,
                               dcn_max_offset)
        x = depthwise_conv_transpose(x, params[f"{name}.up_{r}.weight"], f)
        layers[i] = apply_deform_block(params, f"{name}.node_{r}",
                                       x + layers[i - 1], train, dcn_max_offset)


# ---------------------------------------------------------------- DLASeg ----
def init_dlaseg(key, heads: Dict[str, int], head_conv: int = 256,
                down_ratio: int = 4, last_level: int = 5) -> Dict:
    params: Dict[str, jnp.ndarray] = {}
    first = int(np.log2(down_ratio))
    ch = DLA34_CHANNELS
    keys = iter(jax.random.split(key, 32))
    init_dla34_base(params, next(keys))

    chans = ch[first:]
    scales = [2 ** i for i in range(len(chans))]
    in_ch = list(chans)
    sc = np.array(scales, int)
    for i in range(len(chans) - 1):
        j = -i - 2
        init_ida_up(params, next(keys), f"dla_up.ida_{i}", chans[j], in_ch[j:],
                    (sc[j:] // sc[j]).tolist())
        sc[j + 1:] = sc[j]
        in_ch[j + 1:] = [chans[j] for _ in chans[j + 1:]]

    init_ida_up(params, next(keys), "ida_up", ch[first],
                ch[first:last_level], [2 ** i for i in range(last_level - first)])

    for head, classes in heads.items():
        if head_conv > 0:
            add_plain_conv(params, next(keys), f"{head}.0", ch[first], head_conv, 3)
            params[f"{head}.0.bias"] = jnp.zeros((head_conv,))
            add_plain_conv(params, next(keys), f"{head}.2", head_conv, classes, 1)
            params[f"{head}.2.bias"] = jnp.full(
                (classes,), -2.19 if "hm" in head else 0.0
            )
        else:
            add_plain_conv(params, next(keys), f"{head}.conv", ch[first], classes, 1)
            params[f"{head}.conv.bias"] = jnp.full(
                (classes,), -2.19 if "hm" in head else 0.0
            )
    return params


def load_pretrained(params: Dict, path: str, strip_prefix="module.") -> Dict:
    """Merge a torch DLA/DLASeg checkpoint (e.g. CenterTrack-style) into the
    flat param dict.  Plain convs transpose OIHW->HWIO; DCN main weights
    reshape [O, I, K, K] -> [K*K*I, O] to match the sampled-column layout
    of backbones/deform_conv.py; grouped up-convs land as [2f, 2f, 1, O].
    Keys absent on either side keep their current values."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    merged = dict(params)
    hits = 0
    for k, v in sd.items():
        if k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for cand in (k, "base." + k):
            if cand not in merged:
                continue
            want = merged[cand].shape
            if arr.ndim == 4:
                hwio = arr.transpose(2, 3, 1, 0)
                if hwio.shape == want:
                    merged[cand] = jnp.asarray(hwio)
                elif len(want) == 2 and want == (arr.shape[1] * arr.shape[2] * arr.shape[3],
                                                 arr.shape[0]):
                    merged[cand] = jnp.asarray(
                        hwio.reshape(-1, arr.shape[0]))  # DCN [K*K*I, O]
                else:
                    continue
            elif arr.shape == want:
                merged[cand] = jnp.asarray(arr)
            else:
                continue
            hits += 1
            break
    if hits == 0:
        raise ValueError(f"no overlapping weights found in {path}")
    return merged


def apply_dlaseg(params, x, heads: Dict[str, int], head_conv: int = 256,
                 down_ratio: int = 4, last_level: int = 5, train: bool = False,
                 dcn_max_offset=None):
    """x: [N, H, W, 3].  Returns {head: [N, H/d, W/d, classes]}.

    dcn_max_offset=None keeps exact arbitrary-offset DCN sampling (use for
    converted reference checkpoints); a float bound switches every
    DLAUp/IDAUp deform block to the gather-free shifted-warp kernel
    (deform_conv.deform_conv2d_shift) — preferred when training from
    scratch."""
    first = int(np.log2(down_ratio))
    layers = apply_dla34_base(params, x, train)

    # DLAUp over levels [first..5]
    out = [layers[-1]]
    n_idas = len(layers) - first - 1
    for i in range(n_idas):
        apply_ida_up(params, f"dla_up.ida_{i}", layers, len(layers) - i - 2,
                     len(layers), train, dcn_max_offset)
        out.insert(0, layers[-1])

    y = [out[i] for i in range(last_level - first)]
    apply_ida_up(params, "ida_up", y, 0, len(y), train, dcn_max_offset)

    z = {}
    for head in heads:
        if head_conv > 0:
            h = L.conv2d(y[-1], params[f"{head}.0.weight"]) + params[f"{head}.0.bias"]
            h = jax.nn.relu(h)
            h = L.conv2d(h, params[f"{head}.2.weight"]) + params[f"{head}.2.bias"]
        else:
            h = L.conv2d(y[-1], params[f"{head}.conv.weight"]) + params[f"{head}.conv.bias"]
        z[head] = h
    return z
