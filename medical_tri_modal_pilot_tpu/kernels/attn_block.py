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

Masking follows kernels/attention.py's 2-D key-mask contract (this
fused form is self-attention-only; 3-D block-mask callers keep the
composed path): valid-but-masked keys score MASK_FILL_VALUE, array
padding PAD_NEG, all-masked samples fall back to full coverage so the
reference's uniform-over-real-keys behavior (txt length==3 -> 0,
mbt_encoder.py:707) is preserved. Dead q blocks past a sample's last
valid key emit the pure residual (x rows) — downstream reads none of
them (they are masked as keys everywhere; the fused FFN skips them).

Backward (phase 1): composed from the already-verified kernels — q/k/v
are recomputed by the rowmm LN-projection forward (cheaper than saving
them: their fwd HBM write was the point of this kernel), the flash
backward consumes the saved pre-residual output + row stats, the rowmm
LN backward maps dq/dk/dv to dx/dW/db, and the residual cotangent is a
single fused XLA add.

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

from .attention import (PAD_NEG, STATS_LANES, _bwd, _block_counts,
                        _block_sizes, _combined_mask, _last_valid,
                        _round_up)
from .ffn import _ln_f32
from .rowmm import BLOCK_R, _call_ln_bwd, _call_ln_fwd


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(kc_ref, qc_ref, x_ref, g_ref, bt_ref, w_ref, b_ref, m_ref,
                o_ref, attn_ref, st_ref, k_s, v_s, *, mult: float,
                block_q: int, block_k: int, n_heads: int, d_head: int,
                d_model: int):
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
        attn_ref[0] = jnp.zeros_like(attn_ref[0])
        st = jnp.concatenate(              # m=0, l=1: bwd-safe (never read)
            [jnp.zeros((n, 1), jnp.float32), jnp.ones((n, 1), jnp.float32),
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
            mblk = m_ref[0, :, pl.ds(kb * block_k, block_k)]  # [1, BK]
            new_accs, new_ms, new_ls = [], [], []
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                s = jax.lax.dot_general(
                    q_all[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * mult  # [BQ, BK]
                # f32 combined mask: 0 = live, MASK_FILL = masked,
                # PAD_NEG = array padding
                s = jnp.where(mblk != 0.0, mblk.astype(jnp.float32), s)
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
        attn_ref[0] = attn
        o_ref[0] = xq + attn                       # fused residual
        pad = jnp.zeros((n, STATS_LANES - 2), jnp.float32)
        st_ref[0] = jnp.concatenate(
            [jnp.concatenate([m, l, pad], axis=1)
             for m, l in zip(m_is, l_safes)], axis=1)


def _fwd(x, gamma, beta, w, b, mask, mult: float, num_heads: int):
    B, L, C = x.shape
    H = num_heads
    D = C // H
    block_q, block_k = _block_sizes(L, L)
    lp = max(_round_up(L, block_q), _round_up(L, block_k))
    n_qblocks = lp // block_q
    n_kblocks = lp // block_k
    xp = jnp.pad(x, ((0, 0), (0, lp - L), (0, 0)))
    mp = _combined_mask(mask, lp)
    last = _last_valid(mask)
    kcounts = _block_counts(last, n_kblocks, block_k)
    qcounts = _block_counts(last, n_qblocks, block_q)

    kern = functools.partial(
        _fwd_kernel, mult=mult, block_q=block_q, block_k=block_k,
        n_heads=H, d_head=D, d_model=C)
    out, attn, stats = pl.pallas_call(
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
                pl.BlockSpec((1, 1, lp), lambda b, qi, kc, qc: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, C),
                             lambda b, qi, kc, qc: (b, qi, 0)),
                pl.BlockSpec((1, block_q, C),
                             lambda b, qi, kc, qc: (b, qi, 0)),
                pl.BlockSpec((1, block_q, H * STATS_LANES),
                             lambda b, qi, kc, qc: (b, qi, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((lp, C), x.dtype),
                pltpu.VMEM((lp, C), x.dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, lp, C), x.dtype),
            jax.ShapeDtypeStruct((B, lp, C), x.dtype),
            jax.ShapeDtypeStruct((B, lp, H * STATS_LANES), jnp.float32),
        ],
        interpret=_interpret(),
    )(kcounts, qcounts, xp, gamma[None, :], beta[None, :], w, b[None, :],
      mp)
    return out[:, :L], attn, stats, kcounts, qcounts, lp


def _row_block_flags(mask, L: int):
    """rowmm-granularity (BLOCK_R) per-block validity over the flattened
    [B*L] row order: a block is live when any of its rows is an unmasked
    key (same rule as modules._ffn_row_blocks)."""
    B = mask.shape[0]
    if L % BLOCK_R != 0:
        return None
    alive = (mask[:, 0, :] == 0).reshape(B, L // BLOCK_R, BLOCK_R)
    return jnp.any(alive, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_block(x, gamma, beta, w, b, mask, mult, num_heads):
    out, _, _, _, _, _ = _fwd(x, gamma, beta, w, b, mask, mult, num_heads)
    return out


def _fused_block_fwd(x, gamma, beta, w, b, mask, mult, num_heads):
    out, attn, stats, kcounts, qcounts, lp = _fwd(
        x, gamma, beta, w, b, mask, mult, num_heads)
    return out, (x, gamma, beta, w, b, mask, attn, stats, kcounts, qcounts)


def _fused_block_bwd(mult, num_heads, res, g):
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


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def pallas_attn_block(x, gamma, beta, w, b,
                      key_mask: Optional[jnp.ndarray], scale: float,
                      num_heads: int) -> jnp.ndarray:
    """x [B, L, C] -> x + MHA(StdLN(x)) with key-pad mask semantics
    identical to modules.masked_softmax_attention (2-D [B, L] bool masks
    only — the multitoken 3-D block-mask models keep the composed path).
    ``w``/``b`` are the concatenated q|k|v projection weights [C, 3C] /
    [3C]; ``scale`` is the score divisor (sqrt(d_head))."""
    B, L, _ = x.shape
    if key_mask is None:
        m = jnp.zeros((B, 1, L), jnp.int8)
    else:
        m = key_mask[:, None, :].astype(jnp.int8)
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
