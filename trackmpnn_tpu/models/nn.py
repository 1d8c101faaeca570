"""Functional NN primitives with PyTorch-parity semantics.

The activation-parity target (BASELINE.md) requires bit-level agreement in
*semantics* with torch: GRUCell gate order (r, z, n), BatchNorm1d's biased
normalization variance + unbiased running-var update, and the reference's
custom initializers (normal std=0.01, zero biases, +/-4.595 head priors,
/root/reference/models/track_mpnn.py:36-41).  Everything is a pure function
of explicit param pytrees - no module state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# ---------------------------------------------------------------- linear ----
def linear_init(key, n_in, n_out, w_std=0.01, b_val=0.0, dtype=jnp.float32):
    """Reference-style init: N(0, w_std) weights, constant bias."""
    w = w_std * jax.random.normal(key, (n_in, n_out), dtype)
    b = jnp.full((n_out,), b_val, dtype)
    return {"w": w, "b": b}


def linear(params, x):
    return x @ params["w"] + params["b"]


def matmul_lp(x, w, dtype=None):
    """x @ w, optionally with the MXU fed in a lower precision.

    dtype=None is a plain f32 dot.  dtype=bfloat16 casts BOTH operands to
    bf16 and accumulates in f32 (preferred_element_type) — the standard
    TPU mixed-precision contract: ~4x MXU rate on v5e, f32-accurate sums.
    Gradients flow through the casts (bf16 wgrad/dgrad, cast back)."""
    if dtype is None:
        return x @ w
    return jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ------------------------------------------------------------- batchnorm ----
def batchnorm_init(n, dtype=jnp.float32):
    return {"gamma": jnp.ones((n,), dtype), "beta": jnp.zeros((n,), dtype)}


def batchnorm_stats_init(n, dtype=jnp.float32):
    return {"mean": jnp.zeros((n,), dtype), "var": jnp.ones((n,), dtype)}


def masked_batchnorm(params, stats, x, mask, *, train):
    """BatchNorm1d over the masked rows of x.

    torch semantics: train mode normalizes with the biased batch variance and
    updates running stats with the *unbiased* variance
    (running = (1-m)*running + m*batch); eval mode uses running stats.
    Rows where mask is False neither contribute statistics nor produce
    meaningful output (they are normalized too, but callers mask them out).

    Returns (y, new_stats).
    """
    mask_f = mask.astype(x.dtype)[:, None]
    if train:
        cnt = jnp.maximum(jnp.sum(mask_f), 1.0)
        mean = jnp.sum(x * mask_f, axis=0) / cnt
        var_b = jnp.sum(((x - mean) ** 2) * mask_f, axis=0) / cnt  # biased
        y = (x - mean) * jax.lax.rsqrt(var_b + BN_EPS)
        var_u = var_b * cnt / jnp.maximum(cnt - 1.0, 1.0)  # unbiased
        new_stats = {
            "mean": (1 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * var_u,
        }
    else:
        y = (x - stats["mean"]) * jax.lax.rsqrt(stats["var"] + BN_EPS)
        new_stats = stats
    return y * params["gamma"] + params["beta"], new_stats


# ------------------------------------------------------------------- gru ----
def gru_init(key, n_in, n_hidden, w_std=0.01, dtype=jnp.float32):
    """GRU cell params; torch layout: weight_ih (3H, in) rows [r; z; n].

    We store transposed (in, 3H) for right-multiplication; column blocks
    ordered [r | z | n] to match torch's row blocks.
    """
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": w_std * jax.random.normal(k1, (n_in, 3 * n_hidden), dtype),
        "w_hh": w_std * jax.random.normal(k2, (n_hidden, 3 * n_hidden), dtype),
        "b_ih": jnp.zeros((3 * n_hidden,), dtype),
        "b_hh": jnp.zeros((3 * n_hidden,), dtype),
    }


def gru_cell(params, x, h, dtype=None):
    """torch.nn.GRUCell:  r,z gates sigmoid; n tanh with r-gated hidden path.

    h' = (1 - z) * n + z * h

    dtype selects the matmul precision (see matmul_lp); gates/activations
    stay f32 either way."""
    gi = matmul_lp(x, params["w_ih"], dtype) + params["b_ih"]
    return gru_cell_gates(params, gi, h, dtype=dtype)


def gru_cell_gates(params, gi, h, dtype=None):
    """GRU cell with the input-side gates gi = x @ w_ih + b_ih precomputed.

    Callers with structured inputs factorize that matmul: on a complete
    bipartite edge block, x[i, j] = h[act_i] - h[new_j], so
    gi[i, j] = gd[act_i] - gd[new_j] + b_ih with gd = h_dets @ w_ih -- one
    detection-sized matmul + broadcasts instead of an edge-sized matmul
    (see train/block.py)."""
    H = h.shape[-1]
    gh = matmul_lp(h, params["w_hh"], dtype) + params["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
    h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


# --------------------------------------------------------------- helpers ----
def xavier_uniform(key, shape, gain=1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


class InputTransform(NamedTuple):
    """Linear -> BatchNorm1d -> ReLU -> Linear (ref track_mpnn.py:45-52)."""

    lin1: dict
    bn: dict
    lin2: dict


def input_transform_init(key, n_in, n_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "lin1": linear_init(k1, n_in, n_out, dtype=dtype),
        "bn": batchnorm_init(n_out, dtype),
        "lin2": linear_init(k2, n_out, n_out, dtype=dtype),
    }


def input_transform(params, stats, x, mask, *, train):
    y = linear(params["lin1"], x)
    y, new_stats = masked_batchnorm(params["bn"], stats, y, mask, train=train)
    y = jax.nn.relu(y)
    y = linear(params["lin2"], y)
    return y, new_stats
