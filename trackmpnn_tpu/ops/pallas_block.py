"""Fused Pallas kernel for the block-structured message-passing round.

The block train step (train/block.py) is HBM-round-trip bound on the
[B*T, na, nt, H] edge rectangles: per round XLA materializes the h-side
GRU gates (3H wide), the gate nonlinearities and the masked output as
separate fusions, so the rectangle crosses HBM ~5-6 times.  This kernel
performs the whole per-block round in VMEM:

    gh       = (mask * h_e) @ w_hh + b_hh          (the ONE edge-sized matmul)
    gi[i, j] = ga[i] + sign * gb[j]                (input gates, factorized:
                                                    ga/gb are detection-sized
                                                    and computed in XLA)
    r, z     = sigmoid(gi_rz + gh_rz)
    n        = tanh(gi_n + r * gh_n)
    edge_out = mask * ((1 - z) * n + z * h_e)      (torch GRUCell order,
                                                    ref models/layers.py:97)
    rs, cs   = row / col sums of mask * h_e        (edge_support partials)

so h_e is read once and edge_out written once per round — the minimal
rectangle traffic.  The custom VJP recomputes the gates in a second kernel
(no stacked residuals; pairs with the scan-level remat) and emits
d h_e, d ga, d gb plus grid-accumulated d w_hh / d b_hh; gradients for the
upstream detection matmul flow through ga/gb in XLA.

Grid: BT is processed G blocks at a time (G static, default 8, padded).
Matmuls feed the MXU in bf16 with f32 accumulation when mm_dtype is
bfloat16, mirroring nn.matmul_lp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops.pallas_util import (
    block_specs as _specs,
    const_spec as _const_spec,
    pad_leading as _pad_bt,
)

# blocks per grid step — the VMEM-vs-launch-overhead lever.  Round-3 sweep
# (logs/bench_g[4-7].log, bench shapes B=8/defer/bf16): G=4 12.39 ms,
# G=5 12.23, G=6 12.13 (16.83M edges/s), G>=7 failed to compile against
# Mosaic's DEFAULT 16MB scoped-VMEM budget.  Round 4 (logs/bench_gk_ab*):
# vmem_limit_bytes (TM_VMEM_MB) CAN lift that budget and unlock G up to
# ~24, but raising it is a measured LOSS at every G — e.g. G=6/prefix-4
# runs 8.50 ms with the default budget vs 10.27 with a 110MB one (the
# bigger budget degrades Mosaic's pipelining), so TM_VMEM_MB defaults to
# 0 = leave the compiler default; it remains as the knob that proved the
# G ceiling was a parameter, not the win.  The actual round-4 win was the
# step-major PREFIX segmentation in train/block.py (TM_PREFIX_K).  A
# slice-wise H-per-gate rewrite that avoided the 3H rectangles measured
# SLOWER (13.09 at G=4) and was reverted — see docs/RESULTS.md.
# G default: at K=T prefix segments G=4 beats G=6 (6.54 vs 6.69 ms/step
# at B=8, three identical reproductions each — logs/bench_gk_ab5.log,
# bench_g4_repro_{1,2}.log); the pre-K=T bisect that picked 6 was
# measuring dead-block masking that no longer exists.
DEFAULT_G = int(os.environ.get("TM_BLOCK_G", "4"))
_VMEM_MB = int(os.environ.get("TM_VMEM_MB", "0"))


def _compiler_params():
    if _VMEM_MB <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_MB * 1024 * 1024)


def _sds(shape, dtype, vma):
    """ShapeDtypeStruct with an optional varying-mesh-axes annotation.

    Under shard_map with check_vma=True (which must stay ON — see
    parallel/block_parallel.py) every pallas_call out_shape must declare
    how it varies across the mesh; the callers thread the shard axis in
    via `vma` (a frozenset of axis names, or None off-mesh)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _pvary(x, vma):
    """Broadcast a replicated operand to the varying mesh axes so every
    kernel input has a consistent vma (interpret mode re-executes the
    kernel body as JAX ops, which rejects mixed-vma dot_generals).  The
    custom VJPs never differentiate through this (their bwd functions are
    hand-written), so the weight-cotangent psum stays explicit in _bwd."""
    return jax.lax.pvary(x, tuple(vma)) if vma else x


def _mm(x, w, mm_dtype):
    """x @ w with optional bf16 MXU feed + f32 accumulation (nn.matmul_lp)."""
    if mm_dtype is not None:
        x = x.astype(mm_dtype)
        w = w.astype(mm_dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gates(he_m, ga, gb, whh, bhh, sign, mm_dtype):
    """Recomputable gate stack; he_m is the masked f32 rectangle [G,na,nt,H].
    ga/gb may arrive bf16 (streamed at half the HBM bytes when the step
    runs mixed-precision); gate math is always f32."""
    G, na, nt, H = he_m.shape
    ga = ga.astype(jnp.float32)
    gb = gb.astype(jnp.float32)
    gh = _mm(he_m.reshape(G * na * nt, H), whh, mm_dtype).reshape(
        G, na, nt, 3 * H) + bhh
    gi = ga[:, :, None, :] + sign * gb[:, None, :, :]
    pre_r = gi[..., :H] + gh[..., :H]
    pre_z = gi[..., H:2 * H] + gh[..., H:2 * H]
    r = jax.nn.sigmoid(pre_r)
    z = jax.nn.sigmoid(pre_z)
    ghn = gh[..., 2 * H:]
    n = jnp.tanh(gi[..., 2 * H:] + r * ghn)
    return r, z, n, ghn


def _fwd_kernel(he_ref, ga_ref, gb_ref, whh_ref, bhh_ref, web_ref, m_ref,
                eo_ref, rs_ref, cs_ref, lg_ref, *, sign, mm_dtype):
    m = m_ref[:][..., None]                          # [G, na, nt, 1]
    he_m = he_ref[:].astype(jnp.float32) * m
    r, z, n, _ = _gates(he_m, ga_ref[:], gb_ref[:], whh_ref[:], bhh_ref[:],
                        sign, mm_dtype)
    G, na, nt, H = he_ref.shape
    eo = ((1.0 - z) * n + z * he_m) * m
    eo_ref[:] = eo.astype(eo_ref.dtype)
    rs_ref[:] = jnp.sum(he_m, axis=2)
    cs_ref[:] = jnp.sum(he_m, axis=1)
    # this branch's edge-head partial: Sum_h eo * w_eb[h] (the loss side
    # then never re-reads the H-wide rectangle to form logits)
    lg_ref[:] = jnp.dot(eo.reshape(G * na * nt, H), web_ref[:],
                        preferred_element_type=jnp.float32).reshape(G, na, nt)


def _bwd_kernel(he_ref, ga_ref, gb_ref, whh_ref, whh_t_ref, bhh_ref,
                web_ref, m_ref, geo_ref, grs_ref, gcs_ref, glg_ref,
                dhe_ref, dga_ref, dgb_ref, dwhh_ref, dbhh_ref, dweb_ref,
                *, sign, mm_dtype):
    G, na, nt, H = he_ref.shape
    m = m_ref[:][..., None]
    he_m = he_ref[:].astype(jnp.float32) * m
    r, z, n, ghn = _gates(he_m, ga_ref[:], gb_ref[:], whh_ref[:], bhh_ref[:],
                          sign, mm_dtype)

    # d(masked edge_out): direct cotangent + the head's g_lg (x) w_eb
    glg = glg_ref[:]
    go = (geo_ref[:].astype(jnp.float32)
          + glg[..., None] * web_ref[:].reshape(1, 1, 1, H)) * m
    # dw_eb (as [1, H], transposed outside) from the recomputed output
    eo = ((1.0 - z) * n + z * he_m) * m
    dweb = jnp.sum((eo * glg[..., None]).reshape(G * na * nt, H), axis=0,
                   keepdims=True)
    dz = go * (he_m - n)
    dpre_n = go * (1.0 - z) * (1.0 - n * n)
    dgi_n = dpre_n
    dpre_r = dpre_n * ghn * r * (1.0 - r)
    dpre_z = dz * z * (1.0 - z)
    dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
    dgi = jnp.concatenate([dpre_r, dpre_z, dgi_n], axis=-1)

    dhe_m = (go * z
             + _mm(dgh.reshape(G * na * nt, 3 * H), whh_t_ref[:],
                   mm_dtype).reshape(G, na, nt, H)
             + grs_ref[:][:, :, None, :] + gcs_ref[:][:, None, :, :])
    dhe_ref[:] = (dhe_m * m).astype(dhe_ref.dtype)
    dga_ref[:] = jnp.sum(dgi, axis=2).astype(dga_ref.dtype)
    dgb_ref[:] = (sign * jnp.sum(dgi, axis=1)).astype(dgb_ref.dtype)

    dwhh = _mm(he_m.reshape(G * na * nt, H).T, dgh.reshape(G * na * nt, 3 * H),
               mm_dtype)
    dbhh = jnp.sum(dgh, axis=(0, 1, 2)).reshape(1, 3 * H)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwhh_ref[:] = dwhh
        dbhh_ref[:] = dbhh
        dweb_ref[:] = dweb

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        dwhh_ref[:] += dwhh
        dbhh_ref[:] += dbhh
        dweb_ref[:] += dweb




@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_block_round(h_e, ga, gb, w_hh, b_hh, w_eb, mask3, sign, mm_dtype,
                      g=DEFAULT_G, interpret=False, vma=None):
    """(edge_out, rs, cs, logit) for one message-passing round.

    h_e [BT,na,nt,H] (f32/bf16); ga [BT,na,3H] / gb [BT,nt,3H] f32-or-bf16
    input gates (ga includes b_ih; bf16 halves their HBM streaming both
    ways — gate math and weight-gradient accumulation stay f32, and the
    bf16 dga/dgb cotangents are cast back to f32 by astype's VJP before
    any upstream reduction); w_eb [H,1] this branch's slice of the edge
    output head (its bias is added by the caller); mask3 [BT,na,nt] f32
    0/1; sign +-1.0 applies to gb ('diff' = -1.0).  Returns edge_out in
    h_e's dtype, rs/cs f32, and the per-branch head partial
    logit = edge_out @ w_eb, f32 [BT,na,nt].
    """
    out, _ = _fwd(h_e, ga, gb, w_hh, b_hh, w_eb, mask3, sign, mm_dtype, g,
                  interpret, vma)
    return out


def _fwd(h_e, ga, gb, w_hh, b_hh, w_eb, mask3, sign, mm_dtype, g, interpret,
         vma=None):
    BT, na, nt, H = h_e.shape
    bt_pad = -(-BT // g) * g
    he_p, ga_p, gb_p, m_p = (_pad_bt(x, bt_pad) for x in (h_e, ga, gb, mask3))
    bhh2 = b_hh.reshape(1, 3 * H)
    w_hh_k, bhh2, w_eb_k = (_pvary(x, vma) for x in (w_hh, bhh2, w_eb))

    kernel = functools.partial(_fwd_kernel, sign=sign, mm_dtype=mm_dtype)
    eo, rs, cs, lg = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([he_p.shape, ga_p.shape, gb_p.shape], g)
        + [_const_spec(w_hh.shape), _const_spec(bhh2.shape),
           _const_spec(w_eb.shape)]
        + _specs([m_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt, H), (bt_pad, na, H),
                                (bt_pad, nt, H), (bt_pad, na, nt)], g)),
        out_shape=(
            _sds((bt_pad, na, nt, H), h_e.dtype, vma),
            _sds((bt_pad, na, H), jnp.float32, vma),
            _sds((bt_pad, nt, H), jnp.float32, vma),
            _sds((bt_pad, na, nt), jnp.float32, vma),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(he_p, ga_p, gb_p, w_hh_k, bhh2, w_eb_k, m_p)
    out = (eo[:BT], rs[:BT], cs[:BT], lg[:BT])
    return out, (h_e, ga, gb, w_hh, b_hh, w_eb, mask3)


def _bwd(sign, mm_dtype, g, interpret, vma, res, grads):
    h_e, ga, gb, w_hh, b_hh, w_eb, mask3 = res
    g_eo, g_rs, g_cs, g_lg = grads
    BT, na, nt, H = h_e.shape
    bt_pad = -(-BT // g) * g
    he_p, ga_p, gb_p, m_p, geo_p, grs_p, gcs_p, glg_p = (
        _pad_bt(x, bt_pad)
        for x in (h_e, ga, gb, mask3, g_eo, g_rs, g_cs, g_lg))
    bhh2 = b_hh.reshape(1, 3 * H)
    whh_t = w_hh.T
    w_hh_k, whh_t, bhh2, w_eb_k = (_pvary(x, vma)
                                   for x in (w_hh, whh_t, bhh2, w_eb))

    kernel = functools.partial(_bwd_kernel, sign=sign, mm_dtype=mm_dtype)
    dhe, dga, dgb, dwhh, dbhh, dweb = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([he_p.shape, ga_p.shape, gb_p.shape], g)
        + [_const_spec(w_hh.shape), _const_spec(whh_t.shape),
           _const_spec(bhh2.shape), _const_spec(w_eb.shape)]
        + _specs([m_p.shape, geo_p.shape, grs_p.shape, gcs_p.shape,
                  glg_p.shape], g),
        out_specs=tuple(
            _specs([(bt_pad, na, nt, H), (bt_pad, na, 3 * H),
                    (bt_pad, nt, 3 * H)], g)
            + [_const_spec((H, 3 * H)), _const_spec((1, 3 * H)),
               _const_spec((1, H))]),
        out_shape=(
            _sds((bt_pad, na, nt, H), h_e.dtype, vma),
            _sds((bt_pad, na, 3 * H), ga.dtype, vma),
            _sds((bt_pad, nt, 3 * H), gb.dtype, vma),
            _sds((H, 3 * H), jnp.float32, vma),
            _sds((1, 3 * H), jnp.float32, vma),
            _sds((1, H), jnp.float32, vma),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(he_p, ga_p, gb_p, w_hh_k, whh_t, bhh2, w_eb_k, m_p, geo_p, grs_p,
      gcs_p, glg_p)
    if vma:
        # under shard_map the kernel's weight cotangents are per-shard
        # partials; XLA-derived param grads get psum'd automatically at
        # the pvary transpose of the replicated-params broadcast, but a
        # custom VJP must insert that reduction itself or the carries
        # come back varying (and, worse, per-shard)
        dwhh, dbhh, dweb = jax.lax.psum((dwhh, dbhh, dweb), tuple(vma))
    return (dhe[:BT], dga[:BT], dgb[:BT], dwhh, dbhh.reshape(3 * H),
            dweb.T, jnp.zeros_like(mask3))


fused_block_round.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Scatter-free round: the es variant (round 5).
#
# The round-5 TOP_RAW profile (logs/profile_block_r5.log) shows the fused
# step's residual cost is NOT launch overhead (kernel time scales ~1.16 us
# per block with near-zero intercept) but the XLA ops AROUND the kernel:
# ~30 scatter-adds ([B*capD,64] es segment-sum fwd, [B*capD,192] dga/dgb
# bwd) at XLA's ~13-14 ns/row serialization floor plus the ga_d[act] /
# gb_d[new] gathers — together ~1.2 ms of the 6.54 ms step.  This variant
# moves BOTH into the kernel as per-window one-hot matmuls: a detection's
# global id is w*capD + local, so each block only ever gathers/scatters
# within its window's 256-row universe, and a [capD, na] one-hot (built
# from an iota compare) turns gather into onehot^T @ ga_d[window] and
# scatter into onehot @ rs — tiny MXU matmuls (~60 us/step total) instead
# of serialized row walks.  The window base is w = q % B (step-major block
# order), a pure function of the program id: no scalar prefetch needed.
#
# Used by train/block.py when fused + nattheads == 0 (the production
# config); GAT configs keep fused_block_round + their own aggregation.
# --------------------------------------------------------------------------


def _onehot_t(idx_ref, gi, capd, n, dtype):
    """[capD, n] one-hot transpose: column j has a 1 at row idx[j].

    idx arrives f32 (int values; f32 avoids integer-cotangent plumbing in
    the custom VJP) and 3D [BT, 1, n] (a 2D blocked [BT, n] input violates
    Mosaic's (8,128) block-shape rule at small G; with a middle 1 the last
    two block dims equal the full dims), compared against an i32 iota cast
    to f32 (a direct f32 broadcasted_iota fails Mosaic verification)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (capd, n), 0).astype(
        jnp.float32)
    row = idx_ref[pl.ds(gi, 1)].reshape(1, n)          # [1, n] f32
    return (iota == row).astype(dtype)


def _es_fwd_kernel(he_ref, act_ref, new_ref, gad_ref, gbd_ref, bih_ref,
                   whh_ref, bhh_ref, web_ref, m_ref,
                   eo_ref, lg_ref, es_ref, *, sign, mm_dtype, B, capD, G):
    H = he_ref.shape[-1]
    na, nt = he_ref.shape[1], he_ref.shape[2]
    mmd = mm_dtype or jnp.float32
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero():
        es_ref[:] = jnp.zeros_like(es_ref)

    for gi in range(G):
        base = ((pid * G + gi) % B) * capD
        oh_a = _onehot_t(act_ref, gi, capD, na, mmd)   # [capD, na]
        oh_n = _onehot_t(new_ref, gi, capD, nt, mmd)   # [capD, nt]
        gad = gad_ref[pl.ds(base, capD)]               # [capD, 3H]
        gbd = gbd_ref[pl.ds(base, capD)]
        # gather by matmul: rows i of ga = ga_d[act[i]]
        ga = jax.lax.dot_general(oh_a, gad.astype(mmd), (((0,), (0,)),
                                                         ((), ())),
                                 preferred_element_type=jnp.float32)
        gb = jax.lax.dot_general(oh_n, gbd.astype(mmd), (((0,), (0,)),
                                                         ((), ())),
                                 preferred_element_type=jnp.float32)
        ga = ga + bih_ref[:]
        m = m_ref[pl.ds(gi, 1)].reshape(na, nt)[..., None]
        he_m = he_ref[pl.ds(gi, 1)].reshape(na, nt, H).astype(
            jnp.float32) * m
        gh = _mm(he_m.reshape(na * nt, H), whh_ref[:], mm_dtype).reshape(
            na, nt, 3 * H) + bhh_ref[:]
        gi_g = ga[:, None, :] + sign * gb[None, :, :]
        r = jax.nn.sigmoid(gi_g[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_g[..., H:2 * H] + gh[..., H:2 * H])
        n = jnp.tanh(gi_g[..., 2 * H:] + r * gh[..., 2 * H:])
        eo = ((1.0 - z) * n + z * he_m) * m
        eo_ref[pl.ds(gi, 1)] = eo.reshape(1, na, nt, H).astype(eo_ref.dtype)
        lg_ref[pl.ds(gi, 1)] = jnp.dot(
            eo.reshape(na * nt, H), web_ref[:],
            preferred_element_type=jnp.float32).reshape(1, na, nt)
        rs = jnp.sum(he_m, axis=1)                     # [na, H]
        cs = jnp.sum(he_m, axis=0)                     # [nt, H]
        contrib = (jnp.dot(oh_a, rs.astype(mmd),
                           preferred_element_type=jnp.float32)
                   - jnp.dot(oh_n, cs.astype(mmd),
                             preferred_element_type=jnp.float32))
        es_ref[pl.ds(base, capD)] += contrib


def _es_bwd_kernel(he_ref, act_ref, new_ref, gad_ref, gbd_ref, bih_ref,
                   whh_ref, whh_t_ref, bhh_ref, web_ref, m_ref,
                   geo_ref, glg_ref, ges_ref,
                   dhe_ref, dgad_ref, dgbd_ref, dbih_ref, dwhh_ref,
                   dbhh_ref, dweb_ref, *, sign, mm_dtype, B, capD, G):
    H = he_ref.shape[-1]
    na, nt = he_ref.shape[1], he_ref.shape[2]
    mmd = mm_dtype or jnp.float32
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero():
        dgad_ref[:] = jnp.zeros_like(dgad_ref)
        dgbd_ref[:] = jnp.zeros_like(dgbd_ref)

    # weight/bias grads accumulate in LOCAL values over the unrolled gi
    # loop (they're tiny) and hit their refs ONCE per program — per-gi
    # read-modify-write chains on [1, 3H]-shaped const outputs crash the
    # Mosaic backend (bisected: fwd OK / bwd crash, debug_es_kernel.py)
    acc_dwhh = acc_dbhh = acc_dbih = acc_dweb = None

    for gi in range(G):
        base = ((pid * G + gi) % B) * capD
        oh_a = _onehot_t(act_ref, gi, capD, na, mmd)
        oh_n = _onehot_t(new_ref, gi, capD, nt, mmd)
        gad = gad_ref[pl.ds(base, capD)]
        gbd = gbd_ref[pl.ds(base, capD)]
        ga = jax.lax.dot_general(oh_a, gad.astype(mmd), (((0,), (0,)),
                                                         ((), ())),
                                 preferred_element_type=jnp.float32)
        gb = jax.lax.dot_general(oh_n, gbd.astype(mmd), (((0,), (0,)),
                                                         ((), ())),
                                 preferred_element_type=jnp.float32)
        ga = ga + bih_ref[:]
        m = m_ref[pl.ds(gi, 1)].reshape(na, nt)[..., None]
        he_m = he_ref[pl.ds(gi, 1)].reshape(na, nt, H).astype(
            jnp.float32) * m
        gh = _mm(he_m.reshape(na * nt, H), whh_ref[:], mm_dtype).reshape(
            na, nt, 3 * H) + bhh_ref[:]
        gi_g = ga[:, None, :] + sign * gb[None, :, :]
        r = jax.nn.sigmoid(gi_g[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_g[..., H:2 * H] + gh[..., H:2 * H])
        ghn = gh[..., 2 * H:]
        n = jnp.tanh(gi_g[..., 2 * H:] + r * ghn)

        glg = glg_ref[pl.ds(gi, 1)].reshape(na, nt)
        go = (geo_ref[pl.ds(gi, 1)].reshape(na, nt, H).astype(jnp.float32)
              + glg[..., None] * web_ref[:].reshape(1, 1, H)) * m
        eo = ((1.0 - z) * n + z * he_m) * m
        dweb = jnp.sum((eo * glg[..., None]).reshape(na * nt, H), axis=0,
                       keepdims=True)
        dz = go * (he_m - n)
        dpre_n = go * (1.0 - z) * (1.0 - n * n)
        dpre_r = dpre_n * ghn * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
        dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)

        des = ges_ref[pl.ds(base, capD)]               # [capD, H]
        drs = jax.lax.dot_general(oh_a, des.astype(mmd), (((0,), (0,)),
                                                          ((), ())),
                                  preferred_element_type=jnp.float32)
        dcs = jax.lax.dot_general(oh_n, des.astype(mmd), (((0,), (0,)),
                                                          ((), ())),
                                  preferred_element_type=jnp.float32)
        dhe_m = (go * z
                 + _mm(dgh.reshape(na * nt, 3 * H), whh_t_ref[:],
                       mm_dtype).reshape(na, nt, H)
                 + drs[:, None, :] - dcs[None, :, :])
        dhe_ref[pl.ds(gi, 1)] = (dhe_m * m).reshape(
            1, na, nt, H).astype(dhe_ref.dtype)

        dga_rows = jnp.sum(dgi, axis=1)                # [na, 3H]
        dgb_rows = sign * jnp.sum(dgi, axis=0)         # [nt, 3H]
        dgad_ref[pl.ds(base, capD)] += jnp.dot(
            oh_a, dga_rows.astype(mmd), preferred_element_type=jnp.float32)
        dgbd_ref[pl.ds(base, capD)] += jnp.dot(
            oh_n, dgb_rows.astype(mmd), preferred_element_type=jnp.float32)
        dbih = jnp.sum(dga_rows, axis=0, keepdims=True)
        dwhh = _mm(he_m.reshape(na * nt, H).T,
                   dgh.reshape(na * nt, 3 * H), mm_dtype)
        dbhh = jnp.sum(dgh, axis=(0, 1)).reshape(1, 3 * H)
        acc_dbih = dbih if acc_dbih is None else acc_dbih + dbih
        acc_dwhh = dwhh if acc_dwhh is None else acc_dwhh + dwhh
        acc_dbhh = dbhh if acc_dbhh is None else acc_dbhh + dbhh
        acc_dweb = dweb if acc_dweb is None else acc_dweb + dweb

    @pl.when(pid == 0)
    def _init_w():
        dbih_ref[:] = acc_dbih
        dwhh_ref[:] = acc_dwhh
        dbhh_ref[:] = acc_dbhh
        dweb_ref[:] = acc_dweb

    @pl.when(pid > 0)
    def _acc_w():
        dbih_ref[:] += acc_dbih
        dwhh_ref[:] += acc_dwhh
        dbhh_ref[:] += acc_dbhh
        dweb_ref[:] += acc_dweb


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def fused_block_round_es(h_e, act_l, new_l, ga_d, gb_d, b_ih, w_hh, b_hh,
                         w_eb, mask3, sign, mm_dtype, B, capD,
                         g=DEFAULT_G, interpret=False):
    """(edge_out, logit, es) for one round — scatter-free es variant.

    Same math as fused_block_round, but the input-gate gather
    (ga_d[act] + b_ih / gb_d[new]) and the edge_support reduction
    (es[d] = sum of incident row sums - col sums) happen INSIDE the
    kernel via per-window one-hot matmuls, so the step needs no XLA
    gather/scatter around the round at all.

    h_e [BT,na,nt,H]; act_l/new_l [BT,na|nt] f32 window-LOCAL det ids
    (global id % capD; f32 so the VJP has float cotangent slots);
    ga_d/gb_d [B*capD, 3H] detection-layout input-gate matmuls (pass the
    same array twice for msg 'diff'; AD sums the cotangents); mask3
    [BT,na,nt] f32.  Block q is window q % B (step-major order).
    Returns es f32 [B*capD, H]."""
    out, _ = _es_fwd(h_e, act_l, new_l, ga_d, gb_d, b_ih, w_hh, b_hh, w_eb,
                     mask3, sign, mm_dtype, B, capD, g, interpret)
    return out


def _es_fwd(h_e, act_l, new_l, ga_d, gb_d, b_ih, w_hh, b_hh, w_eb, mask3,
            sign, mm_dtype, B, capD, g, interpret):
    BT, na, nt, H = h_e.shape
    nD = B * capD
    bt_pad = -(-BT // g) * g
    he_p, act_p, new_p, m_p = (_pad_bt(x, bt_pad)
                               for x in (h_e, act_l[:, None, :],
                                         new_l[:, None, :], mask3))
    bhh2 = b_hh.reshape(1, 3 * H)
    bih2 = b_ih.reshape(1, 3 * H)

    kernel = functools.partial(_es_fwd_kernel, sign=sign, mm_dtype=mm_dtype,
                               B=B, capD=capD, G=g)
    eo, lg, es = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([he_p.shape, act_p.shape, new_p.shape], g)
        + [_const_spec(ga_d.shape), _const_spec(gb_d.shape),
           _const_spec(bih2.shape), _const_spec(w_hh.shape),
           _const_spec(bhh2.shape), _const_spec(w_eb.shape)]
        + _specs([m_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt, H), (bt_pad, na, nt)], g)
                        + [_const_spec((nD, H))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, nt, H), h_e.dtype),
            jax.ShapeDtypeStruct((bt_pad, na, nt), jnp.float32),
            jax.ShapeDtypeStruct((nD, H), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(he_p, act_p, new_p, ga_d, gb_d, bih2, w_hh, bhh2, w_eb, m_p)
    out = (eo[:BT], lg[:BT], es)
    return out, (h_e, act_l, new_l, ga_d, gb_d, b_ih, w_hh, b_hh, w_eb,
                 mask3)


def _es_bwd(sign, mm_dtype, B, capD, g, interpret, res, grads):
    h_e, act_l, new_l, ga_d, gb_d, b_ih, w_hh, b_hh, w_eb, mask3 = res
    g_eo, g_lg, g_es = grads
    BT, na, nt, H = h_e.shape
    nD = B * capD
    bt_pad = -(-BT // g) * g
    he_p, act_p, new_p, m_p, geo_p, glg_p = (
        _pad_bt(x, bt_pad) for x in (h_e, act_l[:, None, :],
                                     new_l[:, None, :], mask3, g_eo, g_lg))
    bhh2 = b_hh.reshape(1, 3 * H)
    bih2 = b_ih.reshape(1, 3 * H)
    whh_t = w_hh.T

    kernel = functools.partial(_es_bwd_kernel, sign=sign, mm_dtype=mm_dtype,
                               B=B, capD=capD, G=g)
    dhe, dgad, dgbd, dbih, dwhh, dbhh, dweb = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([he_p.shape, act_p.shape, new_p.shape], g)
        + [_const_spec(ga_d.shape), _const_spec(gb_d.shape),
           _const_spec(bih2.shape), _const_spec(w_hh.shape),
           _const_spec(whh_t.shape), _const_spec(bhh2.shape),
           _const_spec(w_eb.shape)]
        + _specs([m_p.shape, geo_p.shape, glg_p.shape], g)
        + [_const_spec((nD, H))],
        out_specs=tuple(
            _specs([(bt_pad, na, nt, H)], g)
            + [_const_spec((nD, 3 * H)), _const_spec((nD, 3 * H)),
               _const_spec((1, 3 * H)), _const_spec((H, 3 * H)),
               _const_spec((1, 3 * H)), _const_spec((1, H))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, nt, H), h_e.dtype),
            jax.ShapeDtypeStruct((nD, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((nD, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(he_p, act_p, new_p, ga_d, gb_d, bih2, w_hh, whh_t, bhh2, w_eb, m_p,
      geo_p, glg_p, g_es)
    return (dhe[:BT], jnp.zeros_like(act_l), jnp.zeros_like(new_l),
            dgad.astype(ga_d.dtype), dgbd.astype(gb_d.dtype),
            dbih.reshape(b_ih.shape), dwhh, dbhh.reshape(b_hh.shape),
            dweb.T, jnp.zeros_like(mask3))


fused_block_round_es.defvjp(_es_fwd, _es_bwd)


# --------------------------------------------------------------------------
# Standalone window scatter/gather ops (round 5, the composition that
# ships).  The integrated es round above compiles forward-only on this
# toolchain (its backward crashes tpu_compile_helper at every G — see
# tools/debug_es_bwd_bisect.py; even with the gather/scatter/dwhh parts
# stripped the per-block gate-recompute body won't build).  The same
# ~1.2 ms of serialized XLA scatter-adds dies with two SIMPLE kernels
# instead, built only from constructs the micro-bisect proved compile
# (tools/debug_es_kernel.py `combo`: one-hot build + TN dot + dynamic
# read + dynamic accumulate):
#
#   * window_scatter(vals[P,n,F], idx[P,n]) -> [B*capD, F]: the es
#     edge_support reduction, one launch per scan step instead of a
#     13-14 ns/row XLA scatter walk; VJP is the cheap XLA gather.
#   * window_gather2: ga_d[act]/gb_d[new] with fwd as the cheap XLA
#     gather (16 us @ 4k rows) and a custom VJP that routes the
#     cotangent scatter through window_scatter — the bwd-side
#     [B*capD, 3H] scatter-adds were the other half of the cost.
# --------------------------------------------------------------------------


def _wscatter_kernel(vals_ref, idx_ref, out_ref, *, B, capD, G):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    n = vals_ref.shape[1]
    for gi in range(G):
        base = ((pid * G + gi) % B) * capD
        oh = _onehot_t(idx_ref, gi, capD, n, jnp.float32)   # [capD, n]
        v = vals_ref[pl.ds(gi, 1)].reshape(n, vals_ref.shape[2])
        out_ref[pl.ds(base, capD)] += jnp.dot(
            oh, v.astype(jnp.float32), preferred_element_type=jnp.float32)


def _global_idx(idx_l, B, capD):
    P = idx_l.shape[0]
    w = (jnp.arange(P, dtype=jnp.int32) % B)[:, None]
    return w * capD + idx_l.astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def window_scatter(vals, idx_l, B, capD, g=DEFAULT_G, interpret=False,
                   vma=None):
    """sum-scatter vals[p, i] into row (p%B)*capD + idx_l[p, i] of a
    [B*capD, F] f32 output.  idx_l f32 window-local ids; step-major block
    order (block p is window p % B).  VJP w.r.t. vals is the cheap XLA
    gather; idx gets zeros."""
    out, _ = _wscatter_fwd(vals, idx_l, B, capD, g, interpret, vma)
    return out


def _wscatter_fwd(vals, idx_l, B, capD, g, interpret, vma=None):
    P, n, F = vals.shape
    p_pad = -(-P // g) * g
    vals_p = _pad_bt(vals, p_pad)
    idx_p = _pad_bt(idx_l[:, None, :], p_pad)
    kernel = functools.partial(_wscatter_kernel, B=B, capD=capD, G=g)
    out = pl.pallas_call(
        kernel,
        grid=(p_pad // g,),
        in_specs=_specs([vals_p.shape, idx_p.shape], g),
        out_specs=_const_spec((B * capD, F)),
        out_shape=_sds((B * capD, F), jnp.float32, vma),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(vals_p, idx_p)
    return out, (idx_l, jnp.zeros((), vals.dtype))


def _wscatter_bwd(B, capD, g, interpret, vma, res, dout):
    idx_l, vproto = res
    dvals = dout[_global_idx(idx_l, B, capD)]
    return dvals.astype(vproto.dtype), jnp.zeros_like(idx_l)


window_scatter.defvjp(_wscatter_fwd, _wscatter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def window_gather2(ga_d, gb_d, act_l, new_l, B, capD, g=DEFAULT_G,
                   interpret=False, vma=None):
    """(ga_d[act], gb_d[new]) per block — plain XLA gathers forward, but
    the cotangent scatter back to the [B*capD, 3H] detection layout goes
    through the window_scatter kernel instead of XLA's serialized
    scatter-add."""
    out, _ = _wgather2_fwd(ga_d, gb_d, act_l, new_l, B, capD, g, interpret,
                           vma)
    return out


def _wgather2_fwd(ga_d, gb_d, act_l, new_l, B, capD, g, interpret,
                  vma=None):
    ga = ga_d[_global_idx(act_l, B, capD)]
    gb = gb_d[_global_idx(new_l, B, capD)]
    return (ga, gb), (act_l, new_l, jnp.zeros((), ga_d.dtype),
                      jnp.zeros((), gb_d.dtype))


def _wgather2_bwd(B, capD, g, interpret, vma, res, grads):
    act_l, new_l, gap, gbp = res
    dga, dgb = grads
    dga_d = window_scatter(dga.astype(jnp.float32), act_l, B, capD, g,
                           interpret, vma)
    dgb_d = window_scatter(dgb.astype(jnp.float32), new_l, B, capD, g,
                           interpret, vma)
    return (dga_d.astype(gap.dtype), dgb_d.astype(gbp.dtype),
            jnp.zeros_like(act_l), jnp.zeros_like(new_l))


window_gather2.defvjp(_wgather2_fwd, _wgather2_bwd)


def reference_block_round(h_e, ga, gb, w_hh, b_hh, w_eb, mask3, sign,
                          mm_dtype=None):
    """Plain-XLA oracle with identical semantics (for parity tests)."""
    H = h_e.shape[-1]
    m = mask3[..., None]
    he_m = h_e.astype(jnp.float32) * m
    r, z, n, _ = _gates(he_m, ga, gb, w_hh, b_hh, sign, mm_dtype)
    eo_f = ((1.0 - z) * n + z * he_m) * m
    lg = (eo_f @ w_eb)[..., 0]
    return eo_f.astype(h_e.dtype), jnp.sum(he_m, axis=2), \
        jnp.sum(he_m, axis=1), lg
