"""Pallas fused attention block: StdLN -> q/k/v projection -> flash
attention -> +residual, in ONE kernel pass over the stream.

Motivation (measured, see BASELINE_MEASURED.md round 3): at the flagship
shape the fusion stack sits at the roofline knee (~270 flops/byte vs the
chip's ~205 breakeven under load), so HBM traffic costs as much as flops.
The previous composition — LN-fused qkv kernel (kernels/rowmm.py), flash
attention (kernels/attention.py), XLA residual add — writes and re-reads
the three projected streams (2 x [B, L, C] x 3) and runs a separate
3-pass elementwise add per layer, ~300 MB of avoidable HBM traffic per
vslt layer. This kernel keeps q/k/v entirely in VMEM:

  grid (B, n_qblocks), qi innermost. At qi == 0 the whole sample's k and
  v are computed blockwise into VMEM scratch (LN recomputed from the raw
  residual stream, k-loop bounded by the per-sample valid-block count);
  every q block then projects its own q tile and runs the streaming-
  softmax flash loop against the scratch, writing out = attn + x_block
  (the residual folded into the epilogue) plus the pre-residual attention
  output (needed exactly by the backward's delta term) and the (m, l) row
  stats.

Numerics are bit-compatible with the unfused composition: the same
StdLayerNorm math (kernels/ffn.py _ln_f32), the same dt-cast dot chain as
kernels/rowmm.py _fwd_ln_kernel (per-output-column identical), and the
same flash inner loop as kernels/attention.py _fwd_kernel.

Masking follows kernels/attention.py's contract (self-attention only —
query/key/value must be one stream). 2-D key masks: valid-but-masked
keys score MASK_FILL_VALUE, array padding PAD_NEG, all-masked samples
fall back to full coverage so the reference's uniform-over-real-keys
behavior (txt length==3 -> 0, mbt_encoder.py:707) is preserved; dead q
blocks past a sample's last valid key emit the pure residual (x rows) —
downstream reads none of them (they are masked as keys everywhere; the
fused FFN skips them). 3-D [B, Lq, Lk] block masks (the multitoken MBT
variants, mbt_encoder.py:381-423): the per-q-row mask block streams in,
masked pairs score MASK_FILL_VALUE, padding keys beyond the real length
are PAD_NEG by column index, and no per-sample block skipping applies (a
fully-masked row's uniform output depends on every real key).

Backward: ONE kernel per sample (grid (B,)) mirroring the composed
rowmm+flash+rowmm chain it replaces, with every intermediate kept in
VMEM. The composed backward round-trips six [B, L, C] arrays through HBM
per layer (write+read of recomputed q/k/v, then of dq/dk/dv) plus the
reshape copies between the flat rowmm layout and the packed attention
layout — ~400 MB of traffic per layer-step at the flagship shape. Here:
phase 1 recomputes q/k/v blockwise into VMEM scratch (same flags
semantics as the composed `_call_ln_fwd`: row blocks with no unmasked key
are zeroed when L is block-aligned, everything real otherwise); phase 2
runs the flash backward (kernels/attention.py `_bwd_kernel` math) into
f32 VMEM scratches; phase 3 applies the LN-projection backward
(kernels/rowmm.py `_bwd_ln_kernel` math, parameter grads accumulated
across the sequential sample grid) and folds the residual cotangent into
the dx write. Only x / dout / saved-attn / stats are read and dx written
— the same per-sample row-block skip bounds as the forward. The composed
chain is kept as `_bwd_composed` (test oracle for the flag-skip
semantics; not dispatched).

Reference behavior covered: encoder.py:23-28 (pre-norm LN -> MHA ->
residual), attention.py:35-48 (scaled dot-product, -65504 mask fill).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MASK_FILL_VALUE
from .attention import (PAD_NEG, STATS_LANES, _bwd, _block_counts,
                        _block_sizes, _combined_mask, _last_valid,
                        _pad_mask, _round_up)
from .ffn import VAR_FLOOR, _ln_f32
from .rowmm import BLOCK_R, _call_ln_bwd, _call_ln_fwd


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(kc_ref, qc_ref, x_ref, g_ref, bt_ref, w_ref, b_ref, m_ref,
                *refs, mult: float, block_q: int, block_k: int,
                n_heads: int, d_head: int, d_model: int, lean: bool,
                broadcast: bool = True, l_real: int = 0):
    # lean (inference) calls carry only the o_ref output; training-forward
    # calls add the pre-residual attention + row stats the backward needs
    if lean:
        o_ref, k_s, v_s = refs
        attn_ref = st_ref = None
    else:
        o_ref, attn_ref, st_ref, k_s, v_s = refs
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kcount = kc_ref[b]
    qcount = qc_ref[b]
    H, D, C = n_heads, d_head, d_model
    n = block_q
    dt = x_ref.dtype
    gamma = g_ref[0].astype(jnp.float32)
    beta = bt_ref[0].astype(jnp.float32)

    # qi == 0: project the whole sample's k/v into VMEM scratch (persists
    # across the sequential qi grid steps). Blocks >= kcount keep garbage —
    # the flash loop below never reads them.
    @pl.when(qi == 0)
    def _build_kv():
        wkv = w_ref[:, C:].astype(dt)             # [C, 2C]
        bkv = b_ref[0, C:].astype(dt)

        def kv_body(kb, _):
            xb = x_ref[0, pl.ds(kb * block_k, block_k)]
            ln, _, _, _, _, _ = _ln_f32(xb.astype(jnp.float32), gamma,
                                        beta, C)
            y = jax.lax.dot_general(ln.astype(dt), wkv,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y.astype(dt) + bkv
            k_s[pl.ds(kb * block_k, block_k)] = y[:, :C]
            v_s[pl.ds(kb * block_k, block_k)] = y[:, C:]
            return 0

        jax.lax.fori_loop(0, kcount, kv_body, 0)

    @pl.when(qi >= qcount)
    def _dead_block():
        xq = x_ref[0, pl.ds(qi * block_q, block_q)]
        o_ref[0] = xq                              # pure residual
        if not lean:
            attn_ref[0] = jnp.zeros_like(attn_ref[0])
            st = jnp.concatenate(          # m=0, l=1: bwd-safe (never read)
                [jnp.zeros((n, 1), jnp.float32),
                 jnp.ones((n, 1), jnp.float32),
                 jnp.zeros((n, STATS_LANES - 2), jnp.float32)], axis=1)
            st_ref[0] = jnp.concatenate([st] * H, axis=1)

    @pl.when(qi < qcount)
    def _live_block():
        xq = x_ref[0, pl.ds(qi * block_q, block_q)]
        ln, _, _, _, _, _ = _ln_f32(xq.astype(jnp.float32), gamma, beta, C)
        q_all = jax.lax.dot_general(ln.astype(dt), w_ref[:, :C].astype(dt),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        q_all = q_all.astype(dt) + b_ref[0, :C].astype(dt)  # [BQ, C]

        def body(kb, carry):
            accs, m_is, l_is = carry
            k_all = k_s[pl.ds(kb * block_k, block_k)]       # [BK, C]
            v_all = v_s[pl.ds(kb * block_k, block_k)]
            # broadcast: [1, BK] f32 combined; 3-D: [BQ, BK] int8 + column
            # index padding (kernels/attention.py combined_mask semantics)
            mblk = m_ref[0, :, pl.ds(kb * block_k, block_k)]
            if not broadcast:
                j = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (n, block_k), dimension=1)
            new_accs, new_ms, new_ls = [], [], []
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                s = jax.lax.dot_general(
                    q_all[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * mult  # [BQ, BK]
                if broadcast:
                    # f32 combined mask: 0 = live, MASK_FILL = masked,
                    # PAD_NEG = array padding
                    s = jnp.where(mblk != 0.0, mblk.astype(jnp.float32), s)
                else:
                    s = jnp.where(mblk != 0, MASK_FILL_VALUE, s)
                    s = jnp.where(j >= l_real, PAD_NEG, s)
                m_new = jnp.maximum(m_is[h],
                                    jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_is[h] - m_new)
                new_ls.append(l_is[h] * alpha
                              + jnp.sum(p, axis=1, keepdims=True))
                new_accs.append(accs[h] * alpha + jax.lax.dot_general(
                    p.astype(v_all.dtype), v_all[:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                new_ms.append(m_new)
            return tuple(new_accs), tuple(new_ms), tuple(new_ls)

        accs0 = tuple(jnp.zeros((n, D), jnp.float32) for _ in range(H))
        ms0 = tuple(jnp.full((n, 1), -jnp.inf, jnp.float32)
                    for _ in range(H))
        ls0 = tuple(jnp.zeros((n, 1), jnp.float32) for _ in range(H))
        accs, m_is, l_is = jax.lax.fori_loop(0, kcount, body,
                                             (accs0, ms0, ls0))
        l_safes = [jnp.maximum(l, 1e-30) for l in l_is]
        attn = jnp.concatenate(
            [(a / l).astype(dt) for a, l in zip(accs, l_safes)], axis=1)
        o_ref[0] = xq + attn                       # fused residual
        if not lean:
            attn_ref[0] = attn
            pad = jnp.zeros((n, STATS_LANES - 2), jnp.float32)
            st_ref[0] = jnp.concatenate(
                [jnp.concatenate([m, l, pad], axis=1)
                 for m, l in zip(m_is, l_safes)], axis=1)


def _fwd(x, gamma, beta, w, b, mask, mult: float, num_heads: int,
         lean: bool = False):
    B, L, C = x.shape
    H = num_heads
    D = C // H
    block_q, block_k = _block_sizes(L, L)
    lp = max(_round_up(L, block_q), _round_up(L, block_k))
    n_qblocks = lp // block_q
    n_kblocks = lp // block_k
    xp = jnp.pad(x, ((0, 0), (0, lp - L), (0, 0)))
    broadcast = mask.shape[1] == 1
    if broadcast:
        mp = _combined_mask(mask, lp)
        last = _last_valid(mask)
        kcounts = _block_counts(last, n_kblocks, block_k)
        qcounts = _block_counts(last, n_qblocks, block_q)
        m_spec = pl.BlockSpec((1, 1, lp), lambda b, qi, kc, qc: (b, 0, 0))
    else:
        # 3-D block mask: no per-sample skipping (a fully-masked row's
        # uniform output depends on every real key); padding keys are
        # excluded by column index in-kernel
        mp = _pad_mask(mask, lp, lp)
        kcounts = jnp.full((B,), n_kblocks, jnp.int32)
        qcounts = jnp.full((B,), n_qblocks, jnp.int32)
        m_spec = pl.BlockSpec((1, block_q, lp),
                              lambda b, qi, kc, qc: (b, qi, 0))

    kern = functools.partial(
        _fwd_kernel, mult=mult, block_q=block_q, block_k=block_k,
        n_heads=H, d_head=D, d_model=C, lean=lean, broadcast=broadcast,
        l_real=L)
    qrow = lambda b, qi, kc, qc: (b, qi, 0)
    out_specs = [pl.BlockSpec((1, block_q, C), qrow)]
    out_shape = [jax.ShapeDtypeStruct((B, lp, C), x.dtype)]
    if not lean:
        out_specs += [
            pl.BlockSpec((1, block_q, C), qrow),
            pl.BlockSpec((1, block_q, H * STATS_LANES), qrow),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((B, lp, C), x.dtype),
            jax.ShapeDtypeStruct((B, lp, H * STATS_LANES), jnp.float32),
        ]
    outs = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_qblocks),
            in_specs=[
                pl.BlockSpec((1, lp, C), lambda b, qi, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, C), lambda b, qi, kc, qc: (0, 0)),
                pl.BlockSpec((1, C), lambda b, qi, kc, qc: (0, 0)),
                pl.BlockSpec((C, 3 * C), lambda b, qi, kc, qc: (0, 0)),
                pl.BlockSpec((1, 3 * C), lambda b, qi, kc, qc: (0, 0)),
                m_spec,
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((lp, C), x.dtype),
                pltpu.VMEM((lp, C), x.dtype),
            ],
        ),
        out_shape=out_shape,
        interpret=_interpret(),
    )(kcounts, qcounts, xp, gamma[None, :], beta[None, :], w, b[None, :],
      mp)
    if lean:
        return outs[0][:, :L], None, None, kcounts, qcounts, lp
    out, attn, stats = outs
    return out[:, :L], attn, stats, kcounts, qcounts, lp


def _row_block_flags(mask, L: int):
    """rowmm-granularity (BLOCK_R) per-block validity over the flattened
    [B*L] row order: a block is live when any of its rows is an unmasked
    key (same rule as modules._ffn_row_blocks, including its all-masked-
    sample fallback — such samples attend uniformly over every real key,
    so their projections must be real, not zeros)."""
    B = mask.shape[0]
    if L % BLOCK_R != 0 or mask.shape[1] != 1:
        return None                # 3-D block masks: every real row valid
    alive = (mask[:, 0, :] == 0).reshape(B, L // BLOCK_R, BLOCK_R)
    flags = jnp.any(alive, axis=-1)
    return flags | jnp.logical_not(flags.any(axis=-1, keepdims=True))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_block(x, gamma, beta, w, b, mask, mult, num_heads):
    # the primal body only runs when nothing differentiates through the
    # call (eval / serving steps — training traces _fused_block_fwd
    # instead), so it can skip the backward-only attn/stats HBM writes
    out, _, _, _, _, _ = _fwd(x, gamma, beta, w, b, mask, mult, num_heads,
                              lean=True)
    return out


def _fused_block_fwd(x, gamma, beta, w, b, mask, mult, num_heads):
    out, attn, stats, kcounts, qcounts, lp = _fwd(
        x, gamma, beta, w, b, mask, mult, num_heads)
    return out, (x, gamma, beta, w, b, mask, attn, stats, kcounts, qcounts)


def _bwd_composed(mult, num_heads, res, g):
    """The original composed backward (rowmm recompute -> flash bwd ->
    rowmm LN bwd), kept as the semantic oracle for the fused kernel —
    including the documented flag-skip deviation on block-aligned masks."""
    x, gamma, beta, w, b, mask, attn, stats, kcounts, qcounts = res
    B, L, C = x.shape
    H = num_heads
    D = C // H

    # recompute q/k/v with the rowmm LN-projection kernel (bitwise the
    # values the forward held in VMEM; re-projecting costs less than the
    # HBM round-trip this kernel exists to avoid)
    x2 = x.reshape(-1, C)
    from .rowmm import _block_flags
    valid = _block_flags(x2.shape[0], _round_up(x2.shape[0], BLOCK_R),
                         _row_block_flags(mask, L))
    q2, k2, v2 = _call_ln_fwd(x2, gamma, beta, w, b, valid)
    q = q2.reshape(B, L, H, D)
    k = k2.reshape(B, L, H, D)
    v = v2.reshape(B, L, H, D)

    attn4 = attn[:, :L].reshape(B, L, H, D)
    g4 = g.reshape(B, L, H, D)
    dq, dk, dv, _ = _bwd(mult, (q, k, v, mask, attn4, stats, kcounts,
                                qcounts), g4)

    dt = x.dtype
    dx_ln, dgamma, dbeta, dw, db = _call_ln_bwd(
        x2, gamma, beta, w, valid,
        dq.reshape(-1, C).astype(dt), dk.reshape(-1, C).astype(dt),
        dv.reshape(-1, C).astype(dt))
    dx = dx_ln.reshape(B, L, C) + g          # residual cotangent
    return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
            dw.astype(w.dtype), db.astype(b.dtype), None)


def _bwd_fused_kernel(kc_ref, qc_ref, rc_ref, lf_ref, x_ref, g_ref, bt_ref,
                      w_ref, b_ref, do_ref, attn_ref, st_ref, m_ref,
                      dx_ref, dg_ref, dbt_ref, dw_ref, db_ref,
                      q_s, k_s, v_s, dq_s, dk_s, dv_s, *, mult: float,
                      block_q: int, block_k: int, ln_block: int,
                      n_heads: int, d_head: int, d_model: int, l_real: int,
                      broadcast: bool = True):
    b = pl.program_id(0)
    kcount = kc_ref[b]
    qcount = qc_ref[b]
    rcount = rc_ref[b]
    H, D, C = n_heads, d_head, d_model
    lp = x_ref.shape[1]
    n_ln = lp // ln_block
    dt = x_ref.dtype
    gamma = g_ref[0].astype(jnp.float32)
    beta = bt_ref[0].astype(jnp.float32)

    @pl.when(b == 0)
    def _init_param_grads():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        dbt_ref[...] = jnp.zeros_like(dbt_ref[...])
        dw_ref[...] = jnp.zeros_like(dw_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    # ---- phase 1: rebuild q/k/v into VMEM (rowmm _fwd_ln_kernel math;
    # flag-zeroed blocks match the composed recompute's skip semantics)
    wf = w_ref[...].astype(dt)
    bf = b_ref[0].astype(dt)

    def reb(rb, _):
        off = rb * ln_block
        xb = x_ref[0, pl.ds(off, ln_block)]
        ln, _, _, _, _, _ = _ln_f32(xb.astype(jnp.float32), gamma, beta, C)
        y = jax.lax.dot_general(ln.astype(dt), wf, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = (y.astype(dt) + bf) * (lf_ref[b, rb] != 0).astype(dt)
        q_s[pl.ds(off, ln_block)] = y[:, :C]
        k_s[pl.ds(off, ln_block)] = y[:, C:2 * C]
        v_s[pl.ds(off, ln_block)] = y[:, 2 * C:]
        return 0

    jax.lax.fori_loop(0, rcount, reb, 0)

    # ---- phase 2: flash backward (attention.py _bwd_kernel math) into
    # f32 VMEM scratches
    dq_s[...] = jnp.zeros((lp, C), jnp.float32)
    dk_s[...] = jnp.zeros((lp, C), jnp.float32)
    dv_s[...] = jnp.zeros((lp, C), jnp.float32)

    def kbody(kb, _):
        k_all = k_s[pl.ds(kb * block_k, block_k)]
        v_all = v_s[pl.ds(kb * block_k, block_k)]
        if broadcast:
            mblk = m_ref[0, :, pl.ds(kb * block_k, block_k)]      # [1, BK]
            masked = jnp.broadcast_to(mblk != 0.0, (block_q, block_k))
        else:
            jcol = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), dimension=1)

        def qbody(qi, inner):
            dk_hs, dv_hs = inner
            q_all = q_s[pl.ds(qi * block_q, block_q)]
            do_all = do_ref[0, pl.ds(qi * block_q, block_q)].astype(
                jnp.float32)
            o_all = attn_ref[0, pl.ds(qi * block_q, block_q)].astype(
                jnp.float32)
            st_all = st_ref[0, pl.ds(qi * block_q, block_q)]
            if broadcast:
                mblk_q, masked_q = mblk, masked
            else:
                mblk_q = m_ref[0, pl.ds(qi * block_q, block_q),
                               pl.ds(kb * block_k, block_k)]    # [BQ, BK]
                masked_q = (mblk_q != 0) | (jcol >= l_real)
            qrow = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), dimension=0)
            row_valid = (qrow < l_real).astype(jnp.float32)

            new_dk, new_dv = [], []
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                q = q_all[:, sl]
                k = k_all[:, sl]
                v = v_all[:, sl]
                do = do_all[:, sl]
                o = o_all[:, sl]
                m_row = st_all[:, h * STATS_LANES:h * STATS_LANES + 1]
                l_row = st_all[:, h * STATS_LANES + 1:h * STATS_LANES + 2]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * mult
                if broadcast:
                    s = jnp.where(masked_q, mblk_q.astype(jnp.float32), s)
                else:
                    s = jnp.where(mblk_q != 0, MASK_FILL_VALUE, s)
                    s = jnp.where(jcol >= l_real, PAD_NEG, s)
                p = jnp.exp(s - m_row) / l_row
                pv = (p * row_valid).astype(v.dtype)
                new_dv.append(dv_hs[h] + jax.lax.dot_general(
                    pv, do.astype(v.dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                dpart = jax.lax.dot_general(
                    do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                delta = jnp.sum(do * o, axis=1, keepdims=True)
                ds = p * (dpart - delta) * mult
                ds = jnp.where(masked_q, 0.0, ds) * row_valid
                dsd = ds.astype(k.dtype)
                dq_upd = jax.lax.dot_general(
                    dsd, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dq_s[pl.ds(qi * block_q, block_q), sl] += dq_upd
                new_dk.append(dk_hs[h] + jax.lax.dot_general(
                    dsd, q.astype(k.dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return tuple(new_dk), tuple(new_dv)

        zeros = tuple(jnp.zeros((block_k, D), jnp.float32)
                      for _ in range(H))
        dk_hs, dv_hs = jax.lax.fori_loop(0, qcount, qbody, (zeros, zeros))
        dk_s[pl.ds(kb * block_k, block_k)] = jnp.concatenate(dk_hs, axis=1)
        dv_s[pl.ds(kb * block_k, block_k)] = jnp.concatenate(dv_hs, axis=1)
        return 0

    jax.lax.fori_loop(0, kcount, kbody, 0)

    # ---- phase 3: LN-projection backward (rowmm _bwd_ln_kernel math) +
    # residual cotangent folded into the dx write
    def lnb(rb, _):
        off = rb * ln_block
        flag = (lf_ref[b, rb] != 0).astype(jnp.float32)
        xb = x_ref[0, pl.ds(off, ln_block)]
        dob = do_ref[0, pl.ds(off, ln_block)]
        # mirror the composed chain's dtype hops exactly: flash emits dt,
        # the LN bwd concatenates in f32 then re-casts for the matmuls
        dy = jnp.concatenate(
            [dq_s[pl.ds(off, ln_block)].astype(dt),
             dk_s[pl.ds(off, ln_block)].astype(dt),
             dv_s[pl.ds(off, ln_block)].astype(dt)],
            axis=1).astype(jnp.float32) * flag
        dyd = dy.astype(dt)
        _, xhat, c, sd, var, _mu = _ln_f32(xb.astype(jnp.float32), gamma,
                                           beta, C)
        ln = (xhat * gamma + beta).astype(dt)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dw_ref[...] += jax.lax.dot_general(
            ln, dyd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln = jax.lax.dot_general(
            dyd, wf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg_ref[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
        dbt_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
        dxhat = dln * gamma
        xmu = xhat / c
        A = jnp.sum(dxhat * xmu, axis=1, keepdims=True)
        vflag = (var > VAR_FLOOR).astype(jnp.float32)
        dx = (c * (dxhat - jnp.mean(dxhat, axis=1, keepdims=True))
              - (c * c) * A * xmu * vflag / ((C - 1) * sd))
        dx_ref[0, pl.ds(off, ln_block)] = dx.astype(dt) + dob
        return 0

    def lnb_tail(rb, _):
        off = rb * ln_block
        dx_ref[0, pl.ds(off, ln_block)] = do_ref[0, pl.ds(off, ln_block)]
        return 0

    jax.lax.fori_loop(0, rcount, lnb, 0)
    jax.lax.fori_loop(rcount, n_ln, lnb_tail, 0)


def _bwd_block_sizes(lp: int):
    """Tile sizes that evenly divide the forward's padded length (lp is
    always a multiple of 128 and of its own block_q/block_k mix)."""
    bq = 512 if lp % 512 == 0 else (256 if lp % 256 == 0 else 128)
    lnb = 256 if lp % 256 == 0 else 128
    return bq, lnb


def _fused_block_bwd(mult, num_heads, res, g):
    x, gamma, beta, w, b, mask, attn, stats, kcounts, qcounts = res
    B, L, C = x.shape
    H = num_heads
    del kcounts, qcounts  # fwd-granularity counts; recomputed at bwd tiles
    _, block_k = _block_sizes(L, L)
    lp = attn.shape[1]
    block_q, ln_block = _bwd_block_sizes(lp)
    n_ln = lp // ln_block

    broadcast = mask.shape[1] == 1
    nreal = (L + ln_block - 1) // ln_block
    all_real = jnp.concatenate(
        [jnp.ones((B, nreal), jnp.int32),
         jnp.zeros((B, n_ln - nreal), jnp.int32)], axis=1)
    if broadcast:
        last = _last_valid(mask)
        kcounts = _block_counts(last, lp // block_k, block_k)
        qcounts = _block_counts(last, lp // block_q, block_q)
        rebcounts = jnp.minimum(
            (jnp.maximum(kcounts * block_k, qcounts * block_q)
             + ln_block - 1) // ln_block,
            n_ln).astype(jnp.int32)
        # flag semantics of rowmm._block_flags + _row_block_flags:
        # per-block any-unmasked-key when L is block-aligned (all-masked
        # samples keep every block — uniform-attention fallback), every
        # real block otherwise
        if L % ln_block == 0:
            alive = (mask[:, 0, :] == 0).reshape(B, L // ln_block,
                                                 ln_block)
            flags = jnp.any(alive, axis=-1)
            flags = flags | jnp.logical_not(
                flags.any(axis=-1, keepdims=True))
            flags = jnp.pad(flags.astype(jnp.int32),
                            ((0, 0), (0, n_ln - L // ln_block)))
        else:
            flags = all_real
        mp = _combined_mask(mask, lp)
        m_spec_rows = 1
    else:
        # 3-D block mask: full coverage everywhere (composed path used
        # valid=None), padding keys excluded by column index in-kernel
        kcounts = jnp.full((B,), lp // block_k, jnp.int32)
        qcounts = jnp.full((B,), lp // block_q, jnp.int32)
        rebcounts = jnp.full((B,), n_ln, jnp.int32)
        flags = all_real
        mp = _pad_mask(mask, lp, lp)
        m_spec_rows = lp

    xp = jnp.pad(x, ((0, 0), (0, lp - L), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, lp - L), (0, 0)))

    kern = functools.partial(
        _bwd_fused_kernel, mult=mult, block_q=block_q, block_k=block_k,
        ln_block=ln_block, n_heads=H, d_head=C // H, d_model=C, l_real=L,
        broadcast=broadcast)
    const2 = lambda b_, kc, qc, rc, lf: (0, 0)
    persample = lambda b_, kc, qc, rc, lf: (b_, 0, 0)
    dx, dgamma, dbeta, dw, db = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, lp, C), persample),              # x
                pl.BlockSpec((1, C), const2),                     # gamma
                pl.BlockSpec((1, C), const2),                     # beta
                pl.BlockSpec((C, 3 * C), const2),                 # w
                pl.BlockSpec((1, 3 * C), const2),                 # b
                pl.BlockSpec((1, lp, C), persample),              # dout
                pl.BlockSpec((1, lp, C), persample),              # attn
                pl.BlockSpec((1, lp, H * STATS_LANES), persample),
                pl.BlockSpec((1, m_spec_rows, lp), persample),    # mask
            ],
            out_specs=[
                pl.BlockSpec((1, lp, C), persample),              # dx
                pl.BlockSpec((1, C), const2),                     # dgamma
                pl.BlockSpec((1, C), const2),                     # dbeta
                pl.BlockSpec((C, 3 * C), const2),                 # dw
                pl.BlockSpec((1, 3 * C), const2),                 # db
            ],
            scratch_shapes=[
                pltpu.VMEM((lp, C), x.dtype),                     # q
                pltpu.VMEM((lp, C), x.dtype),                     # k
                pltpu.VMEM((lp, C), x.dtype),                     # v
                pltpu.VMEM((lp, C), jnp.float32),                 # dq
                pltpu.VMEM((lp, C), jnp.float32),                 # dk
                pltpu.VMEM((lp, C), jnp.float32),                 # dv
            ],
        ),
        # whole-sample scratches x double buffering exceed the default
        # 16MB scoped-vmem budget; v5e VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        out_shape=[
            jax.ShapeDtypeStruct((B, lp, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
        ],
        interpret=_interpret(),
    )(kcounts, qcounts, rebcounts, flags,
      xp, gamma[None, :], beta[None, :], w, b[None, :], gp, attn, stats, mp)
    return (dx[:, :L], dgamma[0].astype(gamma.dtype),
            dbeta[0].astype(beta.dtype), dw.astype(w.dtype),
            db[0].astype(b.dtype), None)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def pallas_attn_block(x, gamma, beta, w, b,
                      key_mask: Optional[jnp.ndarray], scale: float,
                      num_heads: int) -> jnp.ndarray:
    """x [B, L, C] -> x + MHA(StdLN(x)) with mask semantics identical to
    modules.masked_softmax_attention: None, a 2-D [B, L] key-pad mask
    (True = masked), or a full 3-D [B, Lq, Lk] block mask (the multitoken
    MBT variants). ``w``/``b`` are the concatenated q|k|v projection
    weights [C, 3C] / [3C]; ``scale`` is the score divisor
    (sqrt(d_head))."""
    B, L, _ = x.shape
    if key_mask is None:
        m = jnp.zeros((B, 1, L), jnp.int8)
    elif key_mask.ndim == 2:
        m = key_mask[:, None, :].astype(jnp.int8)
    else:
        m = key_mask.astype(jnp.int8)
    return _fused_block(x, gamma, beta, w, b, m, 1.0 / scale, num_heads)


def xla_attn_block(x, gamma, beta, w, b, key_mask, scale: float,
                   num_heads: int) -> jnp.ndarray:
    """Oracle: the unfused composition (modules.stdln_apply + plain
    projections + masked_softmax_attention + residual)."""
    from ..models.modules import masked_softmax_attention, stdln_apply
    B, L, C = x.shape
    H = num_heads
    dt = x.dtype
    ln = stdln_apply(x, gamma, beta, dt)
    y = ln @ w.astype(dt) + b.astype(dt)
    q, k, v = jnp.split(y, 3, axis=-1)
    ctx = masked_softmax_attention(
        q.reshape(B, L, H, C // H), k.reshape(B, L, H, C // H),
        v.reshape(B, L, H, C // H), key_mask, scale, is_self=True)
    return x + ctx.reshape(B, L, C)
