"""Conv-net primitives with torch-matching semantics, NHWC/TPU-native.

Covers everything the visual backbones need: grouped/dilated conv, BN2d,
PReLU, avg-pool (count_include_pad), bilinear resize with torch's
align_corners=True grid.  Params live in a FLAT dict keyed by torch-style
module paths (e.g. "level1.conv.weight") so pretrained torch checkpoints
convert by key with only an OIHW->HWIO transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5

# Backbone mixed precision: inside a `conv_compute(jnp.bfloat16)` context
# every conv/matmul contraction in this module (and the DCN sites that
# consult it) feeds the MXU in bf16 with f32 accumulation — the same
# matmul_lp convention the tracker uses.  BN/PReLU/losses stay f32 because
# preferred_element_type keeps conv OUTPUTS f32.  The context only needs to
# wrap tracing (EmbedTrainer enters it around its jitted calls).
_CONV_COMPUTE = [None]


class conv_compute:
    """Context manager selecting the conv contraction dtype (None = f32)."""

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        _CONV_COMPUTE.append(self.dtype)
        return self

    def __exit__(self, *exc):
        _CONV_COMPUTE.pop()
        return False


def conv_compute_dtype():
    """The active conv contraction dtype (None = f32)."""
    return _CONV_COMPUTE[-1]


def _cast_operands(x, w):
    dt = _CONV_COMPUTE[-1]
    if dt is not None:
        return x.astype(dt), w.astype(dt)
    return x, w


def conv_general_lp(x, w, **kw):
    """`lax.conv_general_dilated` honoring the conv_compute dtype.

    f32 context: the plain f32 conv, unchanged.  bf16: both operands cast
    to bf16 and the conv output cast back to f32.  NOT implemented as
    bf16 operands + `preferred_element_type=f32` (the einsum convention):
    conv's TRANSPOSE rule feeds the f32 cotangent together with the bf16
    kernel into a new conv and trips the same-dtype check, so that form is
    non-differentiable.  The MXU accumulates in f32 internally either way;
    the bf16-out form costs one output rounding and keeps the backward
    all-bf16 (cotangents are cast by astype's VJP)."""
    dt = _CONV_COMPUTE[-1]
    if dt is None:
        return jax.lax.conv_general_dilated(x, w, **kw)
    out = jax.lax.conv_general_dilated(x.astype(dt), w.astype(dt), **kw)
    return out.astype(jnp.float32)


# --------------------------------------------------------------- primitives --
def conv2d(x, w, stride=1, padding="SAME_TORCH", dilation=1, groups=1, ksize=None):
    """x: NHWC, w: HWIO (I = in_ch / groups). torch 'same-ish' padding:
    pad = (k-1)//2 * dilation on both sides."""
    k = w.shape[0] if ksize is None else ksize
    if padding == "SAME_TORCH":
        p = (k - 1) // 2 * dilation
        padding = [(p, p), (p, p)]
    return conv_general_lp(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )





# torch-parity running-stat updates: BN buffers are NOT parameters.  In
# train mode torch normalizes by biased batch stats and folds the unbiased
# variance into the running buffers with this momentum.
BN_MOMENTUM = 0.1
_BN_UPDATES = None  # active collector dict (param name -> updated buffer)


class collect_bn_updates:
    """Context manager capturing momentum-updated running statistics for
    every train-mode bn2d call, keyed by flat param name.  Trace-safe: the
    captured values are tracers that the caller returns as outputs."""

    def __init__(self):
        self.updates = {}

    def __enter__(self):
        global _BN_UPDATES
        self._prev = _BN_UPDATES
        _BN_UPDATES = self.updates
        return self.updates

    def __exit__(self, *exc):
        global _BN_UPDATES
        _BN_UPDATES = self._prev
        return False


def bn2d(params, prefix, x, train=False):
    """Name-aware BN2d over flat params ('<prefix>.weight/.bias/
    .running_mean/.running_var').  Running buffers are treated as torch
    buffers: stop-gradient in eval mode (they must never receive optimizer
    updates), and momentum-updated values are recorded into the active
    collect_bn_updates context in train mode."""
    gamma, beta = params[f"{prefix}.weight"], params[f"{prefix}.bias"]
    rm, rv = params[f"{prefix}.running_mean"], params[f"{prefix}.running_var"]
    if train:
        m, v_b, v_u = bn_train_stats(x)
        if _BN_UPDATES is not None:
            _BN_UPDATES[f"{prefix}.running_mean"] = (1 - BN_MOMENTUM) * rm + BN_MOMENTUM * m
            _BN_UPDATES[f"{prefix}.running_var"] = (1 - BN_MOMENTUM) * rv + BN_MOMENTUM * v_u
        mean, var = m, v_b
    else:
        mean, var = jax.lax.stop_gradient(rm), jax.lax.stop_gradient(rv)
    return (x - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta


def bn_train_stats(x):
    """(batch_mean, biased_var, unbiased_var) over N,H,W for running-stat updates."""
    m = jnp.mean(x, axis=(0, 1, 2))
    v = jnp.var(x, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    return m, v, v * n / max(n - 1, 1)


def prelu(x, alpha):
    """Per-channel PReLU (torch init 0.25)."""
    return jnp.where(x >= 0, x, x * alpha)


def avg_pool2d(x, ksize=3, stride=2, padding=1):
    """torch F.avg_pool2d with count_include_pad=True: plain sum window / k^2."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, ksize, ksize, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return s / float(ksize * ksize)


def resize_bilinear_align_corners(x, out_h, out_w):
    """torch F.interpolate(mode='bilinear', align_corners=True): source grid
    i_src = i_dst * (in-1)/(out-1)."""
    n, h, w, c = x.shape

    def axis_weights(in_size, out_size):
        if out_size == 1 or in_size == 1:
            idx0 = np.zeros(out_size, np.int32)
            return idx0, idx0, np.ones(out_size, np.float32) * 0.0
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
        i0 = np.floor(src).astype(np.int32)
        i0 = np.clip(i0, 0, in_size - 2)
        frac = (src - i0).astype(np.float32)
        return i0, i0 + 1, frac

    y0, y1, fy = axis_weights(h, out_h)
    x0, x1, fx = axis_weights(w, out_w)
    fy = jnp.asarray(fy)[None, :, None, None]
    fx = jnp.asarray(fx)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def upsample2x(x):
    return resize_bilinear_align_corners(x, x.shape[1] * 2, x.shape[2] * 2)


# ----------------------------------------------------------- param helpers --
def conv_init(key, k, cin_per_group, cout, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out') like the reference init
    (ref espv2/Model.py:224-228): std = sqrt(2 / fan_out)."""
    fan_out = k * k * cout
    std = np.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (k, k, cin_per_group, cout), dtype)


def add_conv(params, key, name, cin, cout, k, groups=1):
    params[f"{name}.weight"] = conv_init(key, k, cin // groups, cout)


def add_bn(params, name, c):
    params[f"{name}.weight"] = jnp.ones((c,))
    params[f"{name}.bias"] = jnp.zeros((c,))
    params[f"{name}.running_mean"] = jnp.zeros((c,))
    params[f"{name}.running_var"] = jnp.ones((c,))


def add_prelu(params, name, c):
    params[f"{name}.weight"] = jnp.full((c,), 0.25)


def apply_cbr(params, name, x, stride=1, groups=1, dilation=1, train=False):
    x = conv2d(x, params[f"{name}.conv.weight"], stride=stride, groups=groups,
               dilation=dilation)
    x = bn2d(params, f"{name}.bn", x, train)
    return prelu(x, params[f"{name}.act.weight"])


def apply_cb(params, name, x, stride=1, groups=1, train=False):
    x = conv2d(x, params[f"{name}.conv.weight"], stride=stride, groups=groups)
    return bn2d(params, f"{name}.bn", x, train)


def apply_br(params, name, x, train=False):
    x = bn2d(params, f"{name}.bn", x, train)
    return prelu(x, params[f"{name}.act.weight"])


def convert_torch_state_dict(state_dict, strip_prefix="module."):
    """torch state_dict -> flat jax param dict (convs OIHW -> HWIO)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = jnp.asarray(arr)
    return out
