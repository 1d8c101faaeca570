"""Fused Pallas kernel for the GAT attention scores.

The XLA GAT support (train/block.py::_block_gat_support) materializes the
H-wide rectangle a_in = |h_att[act_i] - h_att[new_j]| per head per step
just to contract it to a scalar score - the same HBM-trip shape the fused
round eliminated for the GRU.  This kernel forms |diff| in VMEM and emits
only the [BT, na, nt] scores:

    e[i, j] = leaky_relu( sum_h |ha[i, h] - hn[j, h]| * a[h] ) * mask

with a custom VJP that recomputes |diff| (inputs-only residuals) and
returns d ha, d hn and the grid-accumulated d a.  Masked entries are 0 in
both value and cotangent flow, matching the row layout's pre-masked a_in
(mpnn._gat_head, ref layers.py:7-46).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops.pallas_util import (
    block_specs as _specs,
    const_spec as _const_spec,
    pad_leading as _pad_bt,
)

DEFAULT_G = 8


def _fwd_kernel(ha_ref, hn_ref, a_ref, m_ref, e_ref, *, alpha):
    G, na, H = ha_ref.shape
    nt = hn_ref.shape[1]
    diff = jnp.abs(ha_ref[:][:, :, None, :] - hn_ref[:][:, None, :, :])
    pre = jnp.dot(diff.reshape(G * na * nt, H), a_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, na, nt)
    pre = pre * m_ref[:]
    e_ref[:] = jnp.where(pre >= 0.0, pre, alpha * pre)


def _bwd_kernel(ha_ref, hn_ref, a_ref, m_ref, ge_ref,
                dha_ref, dhn_ref, da_ref, *, alpha):
    G, na, H = ha_ref.shape
    nt = hn_ref.shape[1]
    d = ha_ref[:][:, :, None, :] - hn_ref[:][:, None, :, :]
    adiff = jnp.abs(d)
    pre = jnp.dot(adiff.reshape(G * na * nt, H), a_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, na, nt)
    m3 = m_ref[:]
    pre_m = pre * m3
    dpre = ge_ref[:] * jnp.where(pre_m >= 0.0, 1.0, alpha) * m3
    # d|x| = sign(x); lax.sign(0) = 0 matches autodiff's subgradient
    t = dpre[..., None] * jnp.sign(d) * a_ref[:].reshape(1, 1, 1, H)
    dha_ref[:] = jnp.sum(t, axis=2)
    dhn_ref[:] = -jnp.sum(t, axis=1)
    prod = adiff * dpre[..., None]
    da = jnp.sum(prod.reshape(G * na * nt, H), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        da_ref[:] = da

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        da_ref[:] += da


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gat_scores(ha, hn, a, mask3, alpha, g=DEFAULT_G, interpret=False):
    """leaky_relu(|ha_i - hn_j| @ a) * mask, never materializing |diff|.

    ha f32 [BT,na,H]; hn f32 [BT,nt,H]; a f32 [H,1]; mask3 f32 [BT,na,nt]
    0/1; alpha static leaky-relu slope.  Returns f32 [BT,na,nt].
    """
    out, _ = _fwd(ha, hn, a, mask3, alpha, g, interpret)
    return out


def _fwd(ha, hn, a, mask3, alpha, g, interpret):
    BT, na, H = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p = (_pad_bt(x, bt_pad) for x in (ha, hn, mask3))
    kernel = functools.partial(_fwd_kernel, alpha=alpha)
    (e,) = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt)], g)),
        out_shape=(jax.ShapeDtypeStruct((bt_pad, na, nt), jnp.float32),),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p)
    return e[:BT], (ha, hn, a, mask3)


def _bwd(alpha, g, interpret, res, ge):
    ha, hn, a, mask3 = res
    BT, na, H = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p, ge_p = (_pad_bt(x, bt_pad)
                             for x in (ha, hn, mask3, ge))
    kernel = functools.partial(_bwd_kernel, alpha=alpha)
    dha, dhn, da = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape, ge_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, H), (bt_pad, nt, H)], g)
                        + [_const_spec((1, H))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, H), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p, ge_p)
    return dha[:BT], dhn[:BT], da.T, jnp.zeros_like(mask3)


gat_scores.defvjp(_fwd, _bwd)


def reference_gat_scores(ha, hn, a, mask3, alpha):
    """Plain-XLA oracle (the formulation _block_gat_support used)."""
    a_in = jnp.abs(ha[:, :, None, :] - hn[:, None, :, :])
    pre = (a_in @ a)[..., 0] * mask3
    return jnp.where(pre >= 0.0, pre, np.float32(alpha) * pre)
