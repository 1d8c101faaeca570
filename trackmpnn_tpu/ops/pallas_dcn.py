"""Fused Pallas TPU kernel for modulated deformable conv (DCNv2) sampling.

Replaces the reference's sole CUDA extension
(/root/reference/models/dla/pose_dla_dcn.py:16, built per README.md:20-26)
at the kernel level.  Three implementations exist in this repo:

  1. `backbones.deform_conv.deform_conv2d` — XLA gather decomposition.
     Exact, but XLA lowers the bilinear 2D gather to serialized per-row
     dynamic slices (~14 ns/row, tools/bench_deform.py).
  2. `backbones.deform_conv.deform_conv2d_shift` — gather-free bounded-
     offset shifted-warp in XLA.  Vectorizes, but every one of the
     (2R+2)^2 * K^2 terms re-streams the full image through HBM:
     bandwidth-bound, loses to (1) at DLA shapes.
  3. This kernel — the shifted-warp with the shift-sum fused in VMEM.
     A row-tile of the padded input is DMA'd on-chip once (with halo);
     all K^2 taps x (2R+2)^2 integer shifts accumulate against that
     VMEM-resident tile (static slices — no gather, which this Mosaic
     toolchain cannot lower); the modulated sample columns feed the MXU
     per tap without ever touching HBM.  Arithmetic intensity goes from
     ~1 fma / 12 HBM bytes (impl 2) to ~(2R+2)^2 fma per input byte.

Semantics = `deform_conv2d_shift` (offsets clamped to [-R, R]; exactly
DCNv2 whenever offsets are in bound): parity pinned in interpret mode by
tests/test_pallas_dcn.py.  Forward only — training uses the custom-VJP
shift backward in deform_conv.py; on-chip numbers in docs/RESULTS.md.

Restrictions (the only configuration DLA-34 uses): stride=1, dilation=1,
padding=1, ksize=3, single image per call (vmap serializes batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3
KK = K * K


def _dcn_kernel(R, TH, dy_ref, dx_ref, mask_ref, w_ref, x_hbm, out_ref,
                xs_ref, samp_ref, sem):
    """One output row-tile.  Refs:
      dy/dx/mask: [KK, TH, Wo] VMEM      w: [KK*C, O] VMEM
      x_hbm:      [Hp, Wp, C] ANY        out: [TH, Wo, O] VMEM
      xs:         [TH+2M, Wp, C] VMEM scratch (halo row window)
      samp:       [TH, Wo, C] VMEM scratch (one tap's samples)
    """
    i = pl.program_id(0)
    M = R + 2
    Wo = out_ref.shape[1]
    C = samp_ref.shape[2]

    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH + 2 * M)], xs_ref, sem)
    dma.start()
    dma.wait()

    out_ref[...] = jnp.zeros_like(out_ref)
    for k in range(KK):
        kh, kw = k // K, k % K
        # Hoist the per-position offsets into the data layout ONCE per tap:
        # the hat weights are per-(h,w) scalars, the data is channel-lane —
        # computing relu(1-|dy-u|) in [TH,Wo] layout forces a lane->sublane
        # relayout under every term's broadcast-multiply (measured: the
        # dominant cost).  In [TH,Wo,C] layout every term is elementwise.
        dy3 = jnp.broadcast_to(dy_ref[k][..., None], samp_ref.shape)
        dx3 = jnp.broadcast_to(dx_ref[k][..., None], samp_ref.shape)
        samp_ref[...] = jnp.zeros_like(samp_ref)

        def body_u(u, carry, kh=kh, kw=kw, dy3=dy3, dx3=dx3):
            su = u - R
            rs = M + (kh - 1) + su           # row start in the halo window
            wy = jax.nn.relu(1.0 - jnp.abs(dy3 - su.astype(jnp.float32)))
            rows = xs_ref[pl.ds(rs, TH)]     # [TH, Wp, C]
            for v in range(2 * R + 2):
                sv = v - R
                cs = M + (kw - 1) + sv       # static column start
                wx = jax.nn.relu(1.0 - jnp.abs(dx3 - sv))
                samp_ref[...] += wy * wx * rows[:, cs:cs + Wo, :]
            return carry

        jax.lax.fori_loop(0, 2 * R + 2, body_u, 0)

        cols = (samp_ref[...] * mask_ref[k][..., None]).reshape(TH * Wo, C)
        out_ref[...] += jnp.dot(
            cols, w_ref[k * C:(k + 1) * C, :],
            preferred_element_type=jnp.float32,
        ).reshape(TH, Wo, out_ref.shape[2])


@functools.partial(jax.jit, static_argnames=("max_offset", "tile_h", "interpret"))
def deform_conv2d_shift_pallas(x, weight, bias, offset, mask, *,
                               max_offset=4.0, tile_h=8, interpret=False):
    """x: [H, W, Cin] (single image); weight: [KK*Cin, Cout]; offset:
    [H, W, 2*KK] (dy, dx) pairs; mask: [H, W, KK] (sigmoided).
    Returns [H, W, Cout].  stride=1/pad=1/dil=1/k=3 only."""
    H, W, Cin = x.shape
    R = int(np.ceil(max_offset))
    M = R + 2
    TH = tile_h
    nt = -(-H // TH)
    Hp = nt * TH + 2 * M
    # Mosaic slice-alignment: the halo DMA requires the scratch's sublane
    # dim (padded W) to be a multiple of 8 and its lane dim (channels) a
    # multiple of 128.  Zero-pad both; padded channels hit zero weight
    # rows, padded columns lie beyond every reachable tap.
    Cp = -(-Cin // 128) * 128
    Wp = -(-(W + 2 * M) // 8) * 8

    off = offset.reshape(H, W, KK, 2)
    dy = jnp.clip(off[..., 0], -max_offset, max_offset)
    dx = jnp.clip(off[..., 1], -max_offset, max_offset)
    # [KK, Ho, Wo] layout keeps Wo on the lane dim in VMEM; pad rows to a
    # tile multiple (padded rows produce garbage sliced off at the end)
    pad_r = nt * TH - H
    dy_t = jnp.pad(jnp.transpose(dy, (2, 0, 1)), ((0, 0), (0, pad_r), (0, 0)))
    dx_t = jnp.pad(jnp.transpose(dx, (2, 0, 1)), ((0, 0), (0, pad_r), (0, 0)))
    mk_t = jnp.pad(jnp.transpose(mask, (2, 0, 1)), ((0, 0), (0, pad_r), (0, 0)))
    xp = jnp.pad(x, ((M, Hp - H - M), (M, Wp - W - M), (0, Cp - Cin)))

    Cout = weight.shape[1]
    if Cp != Cin:
        weight = jnp.pad(weight.reshape(KK, Cin, Cout),
                         ((0, 0), (0, Cp - Cin), (0, 0))).reshape(KK * Cp, Cout)
    out = pl.pallas_call(
        functools.partial(_dcn_kernel, R, TH),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((KK, TH, W), lambda i: (0, i, 0)),
            pl.BlockSpec((KK, TH, W), lambda i: (0, i, 0)),
            pl.BlockSpec((KK, TH, W), lambda i: (0, i, 0)),
            pl.BlockSpec((KK * Cp, Cout), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TH, W, Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt * TH, W, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * M, Wp, Cp), jnp.float32),
            pltpu.VMEM((TH, W, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dy_t, dx_t, mk_t, weight, xp)
    out = out[:H]
    if bias is not None:
        out = out + bias
    return out
