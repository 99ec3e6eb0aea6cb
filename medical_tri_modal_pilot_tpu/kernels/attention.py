"""Pallas fused masked attention for TPU (forward + custom VJP).

The hot loop of every model is 6 layers x 3 modality stacks of padded
self-attention over <=1005-token sequences (SURVEY.md §3.4). The XLA path
(models/modules.py:masked_softmax_attention) materializes [B, H, Lq, Lk]
scores in HBM; this kernel computes flash-style streaming softmax in VMEM,
never materializing the score matrix, with the reference's exact mask
semantics: valid-but-masked keys score -65504 (fp16-safe min,
attention.py:38) so fully-masked query rows softmax to uniform over the
real keys, while array-padding keys (added here to reach tile-aligned
lengths) are excluded from the denominator entirely.

Masking is fully general: the kernel streams the caller's boolean mask
(as int8) alongside k/v rather than assuming tail-contiguity, because the
early-fusion / MTFusion paths concatenate per-modality masks with padding
mid-sequence, and the multitoken MBT variants pass full [B, Lq, Lk] block
masks (mbt_encoder.py:381-423). A 2D key mask is carried as [B, 1, Lk]
and broadcast over query rows in-kernel; a 3D mask is tiled per q-block.

Padding-aware compute skipping: most of a batch is padding (TIE streams
are truncated to --TIE-len but real stays are shorter). For 2D key masks
the kernel takes a per-sample k-block count (scalar-prefetched) and stops
the k loop at the last block containing any valid key. This is *exact*:
masked keys in counted blocks underflow to 0 in the softmax whenever the
row has one valid key, and an all-masked sample falls back to the full
count so the reference's uniform-over-real-keys behavior (txt length==3
-> 0 trick, mbt_encoder.py:707) is preserved bit-for-bit. The backward
recomputes probabilities blockwise from row stats (m, l) saved by the
forward and honors the same dynamic bound.

Layout: q, k, v stay [B, L, H, Dh] at the interface and enter the
kernels as packed [B, L, H*Dh] (a free bitcast — a head transpose or B*H
reshape would force XLA layout copies around the custom call). Forward
grid is (B, q_blocks); backward grid is (B,); heads run as an unrolled
in-kernel loop over contiguous d_head lane slices, so the mask block is
DMA'd once per program, with dq/dk/dv accumulated in VMEM carries.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MASK_FILL_VALUE

PAD_NEG = -1e30  # array-padding fill: excluded from softmax entirely
STATS_LANES = 8  # row stats stored [*, lq_pad, 8]: lane 0 = m, lane 1 = l


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_sizes(lq: int, lk: int):
    """Shape-adaptive tiles, measured on the target TPU at B=64, D=64:
    block_q 256 runs the TIE-1000 stream ~1.8x faster than 128; block_k is
    the k-loop granularity and also the skip granularity for the dynamic
    per-sample bound — 256 balances loop overhead against skip resolution."""
    bq = min(256, _round_up(lq, 128))
    bk = min(512, _round_up(lk, 128))
    return bq, bk


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _last_valid(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample index of the last unmasked key (-1 if all masked).
    mask: [B, Lq_m, Lk] int8 (1 = masked)."""
    valid = (mask == 0).any(axis=1)                      # [B, Lk]
    idx = jnp.arange(mask.shape[-1], dtype=jnp.int32)
    return jnp.max(jnp.where(valid, idx, -1), axis=1)    # [B]


def _block_counts(last: jnp.ndarray, n_blocks: int, block: int) -> jnp.ndarray:
    """Blocks covering keys/queries [0, last]; all-masked samples use the
    full count (reference uniform-softmax behavior must see every real
    key)."""
    return jnp.where(last < 0, n_blocks, last // block + 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(kc_ref, qc_ref, q_ref, k_ref, v_ref, m_ref, o_ref,
                st_ref=None, *, scale: float, l_real: int, n_kblocks: int,
                block_k: int, combined_mask: bool, n_heads: int,
                d_head: int, lean: bool = False):
    """One program per (sample, q-block); ALL heads are processed in an
    unrolled head loop over contiguous d_head lane slices of a
    [block, H*D] tile (the natural packed layout out of the qkv
    projections — Mosaic cannot lift unit middle dims or shape-cast
    [.., H, D] blocks, but static lane slices compile cleanly). The mask
    block is DMA'd once per q-block, not per head."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    kcount = kc_ref[b]
    qcount = qc_ref[b]

    # q blocks past the per-sample valid length are semantically dead in
    # self-attention (their rows are masked as keys everywhere and no head
    # reads them) — emit zeros and skip the k loop entirely. qcount is the
    # full block count unless the caller declared self-attention.
    n = o_ref.shape[1]
    H, D = n_heads, d_head

    @pl.when(qi >= qcount)
    def _dead_block():
        o_ref[0] = jnp.zeros_like(o_ref[0])
        if not lean:
            st = jnp.concatenate(         # m=0, l=1: bwd-safe (never read)
                [jnp.zeros((n, 1), jnp.float32),
                 jnp.ones((n, 1), jnp.float32),
                 jnp.zeros((n, STATS_LANES - 2), jnp.float32)], axis=1)
            st_ref[0] = jnp.concatenate([st] * H, axis=1)

    @pl.when(qi < qcount)
    def _live_block():
        q_all = q_ref[0]                                   # [BLOCK_Q, H*D]

        def body(kb, carry):
            accs, m_is, l_is = carry
            k_all = k_ref[0, pl.ds(kb * block_k, block_k)]  # [BK, H*D]
            v_all = v_ref[0, pl.ds(kb * block_k, block_k)]
            mblk = m_ref[0, :, pl.ds(kb * block_k, block_k)]  # [1|BQ, BK]
            if not combined_mask:
                j = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (n, block_k), dimension=1)
            new_accs, new_ms, new_ls = [], [], []
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                s = jax.lax.dot_general(
                    q_all[:, sl], k_all[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # [BQ, BK]
                if combined_mask:
                    # f32: 0 = live, MASK_FILL = masked, PAD_NEG = padding
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
        o_ref[0] = jnp.concatenate(
            [(a / l).astype(o_ref.dtype) for a, l in zip(accs, l_safes)],
            axis=1)
        if not lean:
            pad = jnp.zeros((n, STATS_LANES - 2), jnp.float32)
            st_ref[0] = jnp.concatenate(
                [jnp.concatenate([m, l, pad], axis=1)
                 for m, l in zip(m_is, l_safes)], axis=1)


def _pad_mask(mask, lq_pad: int, lk_pad: int):
    """mask is [B, Lq_m, Lk] int8 with Lq_m in {1, Lq}; pad the key dim
    (and, for per-query masks, the query dim) with 1 = masked."""
    B, lq_m, lk = mask.shape
    lq_m_pad = 1 if lq_m == 1 else lq_pad
    return jnp.pad(mask, ((0, 0), (0, lq_m_pad - lq_m), (0, lk_pad - lk)),
                   constant_values=np.int8(1))


def _combined_mask(mask, lk_pad: int):
    """2D key masks precombined to one f32 replace-value array so the
    kernel's k-loop does a single where: 0 = live, MASK_FILL_VALUE =
    valid-but-masked (reference fill semantics, attention.py:38), PAD_NEG =
    array padding (excluded from the softmax denominator)."""
    lk = mask.shape[-1]
    mf = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), jnp.float32(0.0))
    return jnp.pad(mf, ((0, 0), (0, 0), (0, lk_pad - lk)),
                   constant_values=PAD_NEG)


def _fwd(q, k, v, mask, scale, is_self: bool, lean: bool = False):
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    block_q, block_k = _block_sizes(Lq, Lk)
    lq_pad = _round_up(Lq, block_q)
    lk_pad = _round_up(Lk, block_k)
    n_kblocks = lk_pad // block_k
    n_qblocks = lq_pad // block_q
    # operands enter the kernel as [B, L, H*D] — a free bitcast of the
    # natural [B, L, H, D] layout out of the qkv projections; a head
    # transpose or B*H reshape here would force XLA to materialize a
    # layout copy of every operand around the custom call (measured
    # ~4 ms/step of pure copies at the flagship shape)
    qp = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - Lk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - Lk), (0, 0), (0, 0)))
    qp = qp.reshape(B, lq_pad, H * D)
    kp = kp.reshape(B, lk_pad, H * D)
    vp = vp.reshape(B, lk_pad, H * D)
    broadcast_q = mask.shape[1] == 1
    # dynamic skip bound only for 2D (broadcast) key masks: for 3D block
    # masks a fully-masked row's uniform output depends on every real key
    if broadcast_q:
        mp = _combined_mask(mask, lk_pad)
        last = _last_valid(mask)
        kcounts = _block_counts(last, n_kblocks, block_k)
        # in self-attention (Lq == Lk, same stream) queries past the last
        # valid key are dead rows: masked as keys everywhere, read by no
        # output — skip their q blocks entirely (outputs zeroed)
        if is_self and Lq == Lk:
            qcounts = _block_counts(last, n_qblocks, block_q)
        else:
            qcounts = jnp.full((B,), n_qblocks, jnp.int32)
    else:
        mp = _pad_mask(mask, lq_pad, lk_pad)
        kcounts = jnp.full((B,), n_kblocks, jnp.int32)
        qcounts = jnp.full((B,), n_qblocks, jnp.int32)

    grid = (B, n_qblocks)
    if broadcast_q:
        m_spec = pl.BlockSpec((1, 1, lk_pad),
                              lambda b, qi, kc, qc: (b, 0, 0))
    else:
        m_spec = pl.BlockSpec((1, block_q, lk_pad),
                              lambda b, qi, kc, qc: (b, qi, 0))
    kern = functools.partial(
        _fwd_kernel, scale=scale, l_real=Lk,
        n_kblocks=n_kblocks, block_k=block_k,
        combined_mask=broadcast_q, n_heads=H, d_head=D, lean=lean)
    qrow = lambda b, qi, kc, qc: (b, qi, 0)
    out_specs = [pl.BlockSpec((1, block_q, H * D), qrow)]
    out_shape = [jax.ShapeDtypeStruct((B, lq_pad, H * D), q.dtype)]
    if not lean:
        out_specs.append(
            pl.BlockSpec((1, block_q, H * STATS_LANES), qrow))
        out_shape.append(
            jax.ShapeDtypeStruct((B, lq_pad, H * STATS_LANES),
                                 jnp.float32))
    outs = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, H * D), qrow),
                pl.BlockSpec((1, lk_pad, H * D),
                             lambda b, qi, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lk_pad, H * D),
                             lambda b, qi, kc, qc: (b, 0, 0)),
                m_spec,
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=_interpret(),
    )(kcounts, qcounts, qp, kp, vp, mp)
    out = outs[0].reshape(B, lq_pad, H, D)[:, :Lq]
    stats = None if lean else outs[1]
    return out, stats, kcounts, qcounts


# ---------------------------------------------------------------------------
# backward (blockwise, reusing the forward's row stats)
# ---------------------------------------------------------------------------

def _bwd_kernel(kc_ref, qc_ref, q_ref, k_ref, v_ref, do_ref, o_ref, st_ref,
                m_ref, dq_ref, dk_ref, dv_ref, dq_s, *, scale: float,
                l_real: int, lq_real: int, n_qblocks: int, n_kblocks: int,
                block_q: int, block_k: int, broadcast_q: bool, n_heads: int,
                d_head: int):
    # broadcast_q => m_ref is the combined f32 mask (0/MASK_FILL/PAD_NEG)
    """Grid over (B,), heads unrolled over contiguous d_head lane slices
    (packed [.., H*D] layout — see _fwd_kernel). p recomputed per
    (q-block, k-block) from saved (m, l); dq accumulates in an f32 VMEM
    scratch [lq_pad, H*D]; the k loop stops at the per-sample block count
    (skipped k rows keep their zero init — their true gradient is zero
    because every query masks them), and the q loop at the per-sample
    q-block count (dead self-attention rows have zero output gradient
    flowing anywhere real)."""
    b = pl.program_id(0)
    kcount = kc_ref[b]
    qcount = qc_ref[b]
    H, D = n_heads, d_head

    dq_s[...] = jnp.zeros((n_qblocks * block_q, H * D), jnp.float32)
    dk_ref[0] = jnp.zeros_like(dk_ref[0])
    dv_ref[0] = jnp.zeros_like(dv_ref[0])

    def kbody(kb, _):
        k_all = k_ref[0, pl.ds(kb * block_k, block_k)]     # [BK, H*D]
        v_all = v_ref[0, pl.ds(kb * block_k, block_k)]
        jcol = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), dimension=1)

        def qbody(qi, inner):
            dk_hs, dv_hs = inner
            q_all = q_ref[0, pl.ds(qi * block_q, block_q)]  # [BQ, H*D]
            do_all = do_ref[0, pl.ds(qi * block_q, block_q)].astype(
                jnp.float32)
            o_all = o_ref[0, pl.ds(qi * block_q, block_q)].astype(
                jnp.float32)
            st_all = st_ref[0, pl.ds(qi * block_q, block_q)]  # [BQ, H*S]
            if broadcast_q:
                mblk = m_ref[0, :, pl.ds(kb * block_k, block_k)]  # [1, BK]
                masked = jnp.broadcast_to(mblk != 0.0, (block_q, block_k))
            else:
                mblk = m_ref[0, pl.ds(qi * block_q, block_q),
                             pl.ds(kb * block_k, block_k)]        # [BQ, BK]
                masked = (mblk != 0) | (jcol >= l_real)
            qrow = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), dimension=0)
            row_valid = (qrow < lq_real).astype(jnp.float32)

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
                    preferred_element_type=jnp.float32) * scale
                if broadcast_q:
                    s = jnp.where(masked, mblk.astype(jnp.float32), s)
                else:
                    s = jnp.where(mblk != 0, MASK_FILL_VALUE, s)
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
                ds = p * (dpart - delta) * scale
                ds = jnp.where(masked, 0.0, ds) * row_valid
                dsd = ds.astype(k.dtype)
                dq_upd = jax.lax.dot_general(
                    dsd, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dq_s[pl.ds(qi * block_q, block_q), sl] += dq_upd
                new_dk.append(dk_hs[h] + jax.lax.dot_general(
                    dsd, q.astype(k.dtype), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return tuple(new_dk), tuple(new_dv)

        zeros = tuple(jnp.zeros((block_k, D), jnp.float32) for _ in range(H))
        dk_hs, dv_hs = jax.lax.fori_loop(0, qcount, qbody, (zeros, zeros))
        dk_ref[0, pl.ds(kb * block_k, block_k)] = jnp.concatenate(
            dk_hs, axis=1).astype(dk_ref.dtype)
        dv_ref[0, pl.ds(kb * block_k, block_k)] = jnp.concatenate(
            dv_hs, axis=1).astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, kcount, kbody, 0)
    dq_ref[0] = dq_s[...].astype(dq_ref.dtype)


def _bwd(scale, res, g):
    q, k, v, mask, o, stats, kcounts, qcounts = res
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    # the backward picks its own (larger) q tile: its matmuls amortize
    # better at M=512 and the q loop halves; the skip bounds are
    # recomputed from the mask at this granularity (the forward's counts
    # are 256-block-granular)
    block_q = min(512, _round_up(Lq, 128))
    block_k = _block_sizes(Lq, Lk)[1]
    lq_pad = _round_up(Lq, block_q)
    lk_pad = _round_up(Lk, block_k)
    broadcast_q0 = mask.shape[1] == 1
    if broadcast_q0:
        last = _last_valid(mask)
        kcounts = _block_counts(last, lk_pad // block_k, block_k)
        # q skipping only where the forward skipped (is_self): a forward
        # count below its full block count marks a skippable sample; the
        # full-count samples (cross-attention, all-masked fallback, or
        # simply full-length) keep full coverage here too
        bq_f, _ = _block_sizes(Lq, Lk)
        nq_f = _round_up(Lq, bq_f) // bq_f
        full_q = jnp.full((B,), lq_pad // block_q, jnp.int32)
        qcounts = jnp.where(qcounts >= nq_f, full_q,
                            _block_counts(last, lq_pad // block_q, block_q))
    else:
        kcounts = jnp.full((B,), lk_pad // block_k, jnp.int32)
        qcounts = jnp.full((B,), lq_pad // block_q, jnp.int32)
    qp = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, 0), (0, 0))).reshape(
        B, lq_pad, H * D)
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - Lk), (0, 0), (0, 0))).reshape(
        B, lk_pad, H * D)
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - Lk), (0, 0), (0, 0))).reshape(
        B, lk_pad, H * D)
    dop = jnp.pad(g, ((0, 0), (0, lq_pad - Lq), (0, 0), (0, 0))).reshape(
        B, lq_pad, H * D)
    op = jnp.pad(o, ((0, 0), (0, lq_pad - Lq), (0, 0), (0, 0))).reshape(
        B, lq_pad, H * D)
    broadcast_q = mask.shape[1] == 1
    mp = (_combined_mask(mask, lk_pad) if broadcast_q
          else _pad_mask(mask, lq_pad, lk_pad))
    m_rows = mp.shape[1]

    kern = functools.partial(
        _bwd_kernel, scale=scale, l_real=Lk, lq_real=Lq,
        n_qblocks=lq_pad // block_q, n_kblocks=lk_pad // block_k,
        block_q=block_q, block_k=block_k, broadcast_q=broadcast_q,
        n_heads=H, d_head=D)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, lq_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lk_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lk_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lq_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lq_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lq_pad, H * STATS_LANES),
                             lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, m_rows, lk_pad),
                             lambda b, kc, qc: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, lq_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lk_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
                pl.BlockSpec((1, lk_pad, H * D), lambda b, kc, qc: (b, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((lq_pad, H * D), jnp.float32)],
        ),
        # whole-sample blocks x double buffering exceed the default 16MB
        # scoped-vmem budget at fp32 test shapes; v5e VMEM is far larger
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        out_shape=[
            jax.ShapeDtypeStruct((B, lq_pad, H * D), q.dtype),
            jax.ShapeDtypeStruct((B, lk_pad, H * D), k.dtype),
            jax.ShapeDtypeStruct((B, lk_pad, H * D), v.dtype),
        ],
        interpret=_interpret(),
    )(kcounts, qcounts, qp, kp, vp, dop, op, stats, mp)
    dq = dq.reshape(B, lq_pad, H, D)[:, :Lq]
    dk = dk.reshape(B, lk_pad, H, D)[:, :Lk]
    dv = dv.reshape(B, lk_pad, H, D)[:, :Lk]
    return (dq, dk, dv, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention(q, k, v, mask, scale, is_self):
    # primal body == eval/serving path (training traces _flash_fwd):
    # skip the backward-only row-stats output entirely
    out, _, _, _ = _fwd(q, k, v, mask, scale, is_self, lean=True)
    return out


def _flash_fwd(q, k, v, mask, scale, is_self):
    o, stats, kcounts, qcounts = _fwd(q, k, v, mask, scale, is_self)
    return o, (q, k, v, mask, o, stats, kcounts, qcounts)


def _flash_bwd(scale, is_self, res, g):
    return _bwd(scale, res, g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def pallas_masked_attention(q, k, v, key_mask: Optional[jnp.ndarray],
                            scale: float, is_self: bool = False) -> jnp.ndarray:
    """Drop-in for modules.masked_softmax_attention (q/k/v [B, L, H, Dh]).
    Accepts the same mask forms: None, a [B, Lk] key-pad mask (True =
    masked; NOT assumed tail-contiguous — early-fusion concatenations pad
    mid-sequence), or a full [B, Lq, Lk] block mask (multitoken MBT
    variants).

    ``is_self`` (set by MultiHeadAttention when query/key/value are the
    same stream) additionally skips q blocks past each sample's last valid
    key — those rows are dead (masked as keys everywhere, read by nothing)
    and their outputs are emitted as zeros instead of the XLA path's
    unused weighted averages."""
    B = q.shape[0]
    Lk = k.shape[1]
    if key_mask is None:
        m = jnp.zeros((B, 1, Lk), jnp.int8)
    elif key_mask.ndim == 2:
        m = key_mask[:, None, :].astype(jnp.int8)
    else:
        m = key_mask.astype(jnp.int8)
    return _flash_attention(q, k, v, m, 1.0 / scale,
                            bool(is_self) and key_mask is not None
                            and key_mask.ndim == 2)
