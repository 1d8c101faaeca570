"""Fused FactorGraphGRU round as Pallas kernels (experimental, TPU).

Profiling (CLAUDE.md) shows the scanned training step runs at ~2% MXU
utilization: each message-passing round decomposes into ~30 XLA kernels
(gathers, scatters, GRU gate chains, masks) whose fixed overheads and HBM
round trips dwarf the matmul math.  This module fuses one round - for the
'diff' message type without GAT heads - into four Pallas kernels over a
[B, cap] block-diagonal batch (batch in the grid, so nothing serializes
under batching):

  fwd A (edge phase):  per row-tile, gather endpoint hiddens from the
        VMEM-resident window, diff, edge-GRU gates; accumulate the signed
        incident-edge sums (edge_support) into a per-window VMEM block.
  fwd B (node phase):  node-GRU gates from edge_support, masked merge to
        h_out; saves gate residuals.
  bwd B: edge+node GRU backward per tile -> d_ns, d_es, direct d_h terms,
        and weight/bias gradient accumulators (flushed on the last step).
  bwd A: d_h assembly - direct terms + scatter-transpose of d_ns +
        gather-diff-transpose of d_es, per window in VMEM.

The jnp reference implementations define the semantics; interpret-mode and
TPU tests pin both values and gradients.  Enable with TM_PALLAS_ROUND=1
(model dispatch in models/mpnn.py); requires cap % tile == 0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def want_fused_round() -> bool:
    return os.environ.get("TM_PALLAS_ROUND", "0") == "1"


# interpret-mode toggle for tests (list so tests can flip it in place)
_INTERPRET = [False]


# ---------------------------------------------------------------- reference --
def _gru(x, h, w_ih, w_hh, b_ih, b_hh):
    H = h.shape[-1]
    gi = x @ w_ih + b_ih
    gh = h @ w_hh + b_hh
    r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gi[..., H:2 * H] + gh[..., H:2 * H])
    n = jnp.tanh(gi[..., 2 * H:] + r * gh[..., 2 * H:])
    return (1.0 - z) * n + z * h, (r, z, n)


def round_reference(h, past, fut, is_det, live, we, wn):
    """One 'diff' round on a [B, cap, H] batch with window-local indices.

    we/wn: dicts {w_ih [H,3H], w_hh [H,3H], b_ih [3H], b_hh [3H]}.
    Returns h_out [B, cap, H]."""
    B, cap, H = h.shape
    edge = live & ~is_det

    def one(hb, pastb, futb, edgeb, liveb, is_detb):
        ns = jnp.where(edgeb[:, None], hb[pastb] - hb[futb], 0.0)
        eo, _ = _gru(ns, hb, we["w_ih"], we["w_hh"], we["b_ih"], we["b_hh"])
        sign = jnp.where(edgeb, 1.0, 0.0)
        pos = jax.ops.segment_sum(hb * sign[:, None], pastb, num_segments=cap)
        neg = jax.ops.segment_sum(hb * sign[:, None], futb, num_segments=cap)
        es = pos - neg
        no, _ = _gru(es, hb, wn["w_ih"], wn["w_hh"], wn["b_ih"], wn["b_hh"])
        out = jnp.where(is_detb[:, None], no, eo)
        return jnp.where(liveb[:, None], out, 0.0)

    return jax.vmap(one)(h, past, fut, edge, live, is_det)


# ------------------------------------------------------------- fwd kernels --
def _fwd_a_kernel(idx_ref, h_ref, we_ref, be_ref, eo_ref, ns_ref, re_ref,
                  ze_ref, ne_ref, es_ref):
    """Edge phase for one (window, tile): gather-diff + edge GRU + signed
    accumulation of h into es (per-window revisited block)."""
    t = pl.program_id(1)
    T = idx_ref.shape[1]
    H = h_ref.shape[2]

    @pl.when(t == 0)
    def _():
        es_ref[:] = jnp.zeros_like(es_ref)

    def body(k, _):
        p = idx_ref[0, k, 0]
        f = idx_ref[0, k, 1]
        e = idx_ref[0, k, 2]
        row0 = t * T

        @pl.when(e == 1)
        def _():
            ns_ref[0, pl.ds(k, 1), :] = (
                h_ref[0, pl.ds(p, 1), :] - h_ref[0, pl.ds(f, 1), :]
            )
            hrow = h_ref[0, pl.ds(row0 + k, 1), :]
            es_ref[0, pl.ds(p, 1), :] += hrow
            es_ref[0, pl.ds(f, 1), :] += -hrow

        @pl.when(e != 1)
        def _():
            ns_ref[0, pl.ds(k, 1), :] = jnp.zeros((1, H), ns_ref.dtype)

        return 0

    jax.lax.fori_loop(0, T, body, 0)

    h_tile = h_ref[0, pl.ds(pl.program_id(1) * T, T), :]
    ns = ns_ref[0]
    gi = jnp.dot(ns, we_ref[0], preferred_element_type=jnp.float32) + be_ref[0, 0]
    gh = jnp.dot(h_tile, we_ref[1], preferred_element_type=jnp.float32) + be_ref[0, 1]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
    re_ref[0] = r
    ze_ref[0] = z
    ne_ref[0] = n
    eo_ref[0] = (1.0 - z) * n + z * h_tile


def _fwd_b_kernel(mask_ref, h_ref, eo_ref, es_ref, wn_ref, bn_ref,
                  out_ref, rn_ref, zn_ref, nn_ref):
    """Node phase: node GRU from edge_support + masked merge.
    mask_ref: VMEM int32 [1, T, 2] = (is_live_edge, is_live_det) - Mosaic
    only loads scalars from SMEM, so vectorized masks ride in VMEM."""
    H = h_ref.shape[2]
    h_tile = h_ref[0]
    es = es_ref[0]
    gi = jnp.dot(es, wn_ref[0], preferred_element_type=jnp.float32) + bn_ref[0, 0]
    gh = jnp.dot(h_tile, wn_ref[1], preferred_element_type=jnp.float32) + bn_ref[0, 1]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
    no = (1.0 - z) * n + z * h_tile
    rn_ref[0] = r
    zn_ref[0] = z
    nn_ref[0] = n
    is_det = (mask_ref[0, :, 1] == 1)[:, None]
    live = (mask_ref[0, :, 0] == 1)[:, None] | is_det  # live = edge|det rows
    out = jnp.where(is_det, no, eo_ref[0])
    out_ref[0] = jnp.where(live, out, 0.0)


def _round_fwd_pallas(h, idxw, we, wn, tile):
    """h [B,cap,H]; idxw [B,cap,4] window-local (past,fut,is_live_edge,is_live_det)."""
    B, cap, H = h.shape
    nt = cap // tile
    be = jnp.stack([we["b_ih"], we["b_hh"]])[None]  # [1,2,3H]
    bn = jnp.stack([wn["b_ih"], wn["b_hh"]])[None]
    wes = jnp.stack([we["w_ih"], we["w_hh"]])       # [2,H,3H]
    wns = jnp.stack([wn["w_ih"], wn["w_hh"]])

    tile_spec = lambda: pl.BlockSpec((1, tile, H), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM)
    win_spec = lambda: pl.BlockSpec((1, cap, H), lambda b, t: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    mask_spec = lambda: pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM)
    masks = idxw[..., 2:4]
    out_shapes = [jax.ShapeDtypeStruct((B, cap, H), jnp.float32)
                  for _ in range(5)] + [jax.ShapeDtypeStruct((B, cap, H), jnp.float32)]
    eo, ns, re, ze, ne, es = pl.pallas_call(
        _fwd_a_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, 4), lambda b, t: (b, t, 0),
                         memory_space=pltpu.SMEM),
            win_spec(),
            pl.BlockSpec((2, H, 3 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec(), tile_spec(), tile_spec(), tile_spec(),
                   tile_spec(), win_spec()],
        out_shape=out_shapes,
        interpret=_INTERPRET[0],
    )(idxw, h, wes, be)

    out, rn, zn, nn = pl.pallas_call(
        _fwd_b_kernel,
        grid=(B, nt),
        in_specs=[
            mask_spec(),
            tile_spec(), tile_spec(), tile_spec(),
            pl.BlockSpec((2, H, 3 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec()] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, cap, H), jnp.float32)] * 4,
        interpret=_INTERPRET[0],
    )(masks, h, eo, es, wns, bn)
    return out, (ns, es, re, ze, ne, rn, zn, nn)


# ------------------------------------------------------------- bwd kernels --
def _gru_bwd_tile(x, h, r, z, n, g, w_stack, b_hh):
    """Per-tile GRU backward.  Returns (dx, dh, dgi, dgh)."""
    H = h.shape[1]
    gh_n = (jnp.dot(h, w_stack[1], preferred_element_type=jnp.float32)
            + b_hh)[:, 2 * H:]
    dz = (h - n) * g
    dn = (1.0 - z) * g
    dh_direct = z * g
    da_n = (1.0 - n * n) * dn
    dgh_n = r * da_n
    dr = da_n * gh_n
    da_z = z * (1.0 - z) * dz
    da_r = r * (1.0 - r) * dr
    dgi = jnp.concatenate([da_r, da_z, da_n], axis=1)
    dgh = jnp.concatenate([da_r, da_z, dgh_n], axis=1)
    dx = jnp.dot(dgi, w_stack[0].T, preferred_element_type=jnp.float32)
    dh = dh_direct + jnp.dot(dgh, w_stack[1].T, preferred_element_type=jnp.float32)
    return dx, dh, dgi, dgh


def _bwd_b_kernel(mask_ref, g_ref, h_ref, ns_ref, es_ref, re_ref, ze_ref,
                  ne_ref, rn_ref, zn_ref, nn_ref, we_ref, be_ref, wn_ref,
                  bn_ref, dns_ref, des_ref, ddir_ref, dwe_ref, dbe_ref,
                  dwn_ref, dbn_ref):
    """GRU backwards per tile; weight-grad accumulators revisited globally."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dwn_ref[:] = jnp.zeros_like(dwn_ref)
        dbn_ref[:] = jnp.zeros_like(dbn_ref)

    g = g_ref[0]
    h = h_ref[0]
    is_det = (mask_ref[0, :, 1] == 1)[:, None]
    is_edge = (mask_ref[0, :, 0] == 1)[:, None]
    g_no = jnp.where(is_det, g, 0.0)
    g_eo = jnp.where(is_edge, g, 0.0)

    dx_n, dh_n, dgi_n, dgh_n = _gru_bwd_tile(
        es_ref[0], h, rn_ref[0], zn_ref[0], nn_ref[0], g_no, wn_ref,
        bn_ref[0, 1])
    dx_e, dh_e, dgi_e, dgh_e = _gru_bwd_tile(
        ns_ref[0], h, re_ref[0], ze_ref[0], ne_ref[0], g_eo, we_ref,
        be_ref[0, 1])

    des_ref[0] = dx_n
    dns_ref[0] = dx_e
    ddir_ref[0] = dh_n + dh_e

    dwe_ref[0] += jnp.dot(ns_ref[0].T, dgi_e, preferred_element_type=jnp.float32)
    dwe_ref[1] += jnp.dot(h.T, dgh_e, preferred_element_type=jnp.float32)
    dbe_ref[0, 0] += jnp.sum(dgi_e, axis=0)
    dbe_ref[0, 1] += jnp.sum(dgh_e, axis=0)
    dwn_ref[0] += jnp.dot(es_ref[0].T, dgi_n, preferred_element_type=jnp.float32)
    dwn_ref[1] += jnp.dot(h.T, dgh_n, preferred_element_type=jnp.float32)
    dbn_ref[0, 0] += jnp.sum(dgi_n, axis=0)
    dbn_ref[0, 1] += jnp.sum(dgh_n, axis=0)


def _bwd_a_kernel(idx_ref, dns_ref, des_ref, ddir_ref, dh_ref):
    """d_h assembly per window: direct terms + scatter-transpose of d_ns +
    gather-diff-transpose of d_es."""
    t = pl.program_id(1)
    T = idx_ref.shape[1]

    @pl.when(t == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    row0 = t * T
    dh_ref[0, pl.ds(row0, T), :] += ddir_ref[0]

    def body(k, _):
        p = idx_ref[0, k, 0]
        f = idx_ref[0, k, 1]
        e = idx_ref[0, k, 2]

        @pl.when(e == 1)
        def _():
            # gather-diff transpose: this edge row receives des[p] - des[f]
            dh_ref[0, pl.ds(row0 + k, 1), :] += (
                des_ref[0, pl.ds(p, 1), :] - des_ref[0, pl.ds(f, 1), :]
            )
            # scatter transpose: endpoints receive +/- dns[row]
            row = dns_ref[0, pl.ds(row0 + k, 1), :]
            dh_ref[0, pl.ds(p, 1), :] += row
            dh_ref[0, pl.ds(f, 1), :] += -row

        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _round_bwd_pallas(idxw, h, res, we, wn, g_out, tile):
    B, cap, H = h.shape
    nt = cap // tile
    ns, es, re, ze, ne, rn, zn, nn = res
    be = jnp.stack([we["b_ih"], we["b_hh"]])[None]
    bn = jnp.stack([wn["b_ih"], wn["b_hh"]])[None]
    wes = jnp.stack([we["w_ih"], we["w_hh"]])
    wns = jnp.stack([wn["w_ih"], wn["w_hh"]])

    tile_spec = lambda: pl.BlockSpec((1, tile, H), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM)
    mask_spec = lambda: pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM)
    masks = idxw[..., 2:4]
    acc_w = lambda: pl.BlockSpec((2, H, 3 * H), lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    acc_b = lambda: pl.BlockSpec((1, 2, 3 * H), lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    w_in = lambda: pl.BlockSpec((2, H, 3 * H), lambda b, t: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    b_in = lambda: pl.BlockSpec((1, 2, 3 * H), lambda b, t: (0, 0, 0),
                                memory_space=pltpu.VMEM)

    dns, des, ddir, dwe, dbe, dwn, dbn = pl.pallas_call(
        _bwd_b_kernel,
        grid=(B, nt),
        in_specs=[
            mask_spec(),
            tile_spec(), tile_spec(), tile_spec(), tile_spec(), tile_spec(),
            tile_spec(), tile_spec(), tile_spec(), tile_spec(), tile_spec(),
            w_in(), b_in(), w_in(), b_in(),
        ],
        out_specs=[tile_spec(), tile_spec(), tile_spec(),
                   acc_w(), acc_b(), acc_w(), acc_b()],
        out_shape=[
            jax.ShapeDtypeStruct((B, cap, H), jnp.float32),
            jax.ShapeDtypeStruct((B, cap, H), jnp.float32),
            jax.ShapeDtypeStruct((B, cap, H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 2, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((2, H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 2, 3 * H), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(masks, g_out, h, ns, es, re, ze, ne, rn, zn, nn, wes, be, wns, bn)

    dh = pl.pallas_call(
        _bwd_a_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, 4), lambda b, t: (b, t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cap, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, H), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec(),
        ],
        out_specs=pl.BlockSpec((1, cap, H), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cap, H), jnp.float32),
        interpret=_INTERPRET[0],
    )(idxw, dns, des, ddir)

    d_we = {"w_ih": dwe[0], "w_hh": dwe[1], "b_ih": dbe[0, 0], "b_hh": dbe[0, 1]}
    d_wn = {"w_ih": dwn[0], "w_hh": dwn[1], "b_ih": dbn[0, 0], "b_hh": dbn[0, 1]}
    return dh, d_we, d_wn


# ------------------------------------------------------------- public API --
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_round(h, idxw, we, wn, _unused, tile=256):
    """One fused 'diff' FactorGraphGRU round over [B, cap, H] windows.

    idxw int32[B, cap, 4]: (past, fut, is_live_edge, is_live_det), indices
    window-local.  Differentiable in h and both GRU weight dicts."""
    out, _ = _round_fwd_pallas(h, idxw, we, wn, tile)
    return out


def _fr_fwd(h, idxw, we, wn, _unused, tile):
    out, res = _round_fwd_pallas(h, idxw, we, wn, tile)
    return out, (h, idxw, res, we, wn)


def _fr_bwd(tile, saved, g):
    h, idxw, res, we, wn = saved
    dh, d_we, d_wn = _round_bwd_pallas(idxw, h, res, we, wn, g, tile)
    return dh, None, d_we, d_wn, None


fused_round.defvjp(_fr_fwd, _fr_bwd)

