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

Layout: q, k, v are [B, H, L, Dh]. Grid is (B*H, q_blocks); each step
streams k/v blocks through the MXU with running max/denominator
accumulators in VMEM.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_sizes(lq: int, lk: int):
    """Shape-adaptive tiles, measured on the target TPU at B=64, D=64:
    (256, 1024) runs the TIE-1000 stream 1.8x faster than (128, 128) and
    ~20% faster than the XLA attention path; short streams shrink to one
    block so img/txt stacks don't pad to 1024 rows."""
    bq = min(256, _round_up(lq, 128))
    bk = min(1024, _round_up(lk, 128))
    return bq, bk


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float,
                l_real: int, n_kblocks: int, block_k: int):
    q = q_ref[0]                                       # [BLOCK_Q, D]
    acc = jnp.zeros((q.shape[0], q_ref.shape[-1]), jnp.float32)
    m_i = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((q.shape[0], 1), jnp.float32)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]
        mblk = m_ref[0, :, pl.ds(kb * block_k, block_k)]  # [1|BQ, BK] int8
        s = jnp.where(mblk != 0, MASK_FILL_VALUE, s)
        j = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(j >= l_real, PAD_NEG, s)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc, m_i, l_i = jax.lax.fori_loop(0, n_kblocks, body, (acc, m_i, l_i))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _pad_mask(mask, lq_pad: int, lk_pad: int):
    """mask is [B, Lq_m, Lk] int8 with Lq_m in {1, Lq}; pad the key dim
    (and, for per-query masks, the query dim) with 1 = masked."""
    B, lq_m, lk = mask.shape
    lq_m_pad = 1 if lq_m == 1 else lq_pad
    return jnp.pad(mask, ((0, 0), (0, lq_m_pad - lq_m), (0, lk_pad - lk)),
                   constant_values=np.int8(1))


def _fwd(q, k, v, mask, scale):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    block_q, block_k = _block_sizes(Lq, Lk)
    lq_pad = _round_up(Lq, block_q)
    lk_pad = _round_up(Lk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - Lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0)))
    qp = qp.reshape(B * H, lq_pad, D)
    kp = kp.reshape(B * H, lk_pad, D)
    vp = vp.reshape(B * H, lk_pad, D)
    mp = _pad_mask(mask, lq_pad, lk_pad)
    broadcast_q = mp.shape[1] == 1

    n_qblocks = lq_pad // block_q
    grid = (B * H, n_qblocks)
    if broadcast_q:
        m_spec = pl.BlockSpec((1, 1, lk_pad), lambda bh, qi: (bh // H, 0, 0))
    else:
        m_spec = pl.BlockSpec((1, block_q, lk_pad),
                              lambda bh, qi: (bh // H, qi, 0))
    kern = functools.partial(
        _fwd_kernel, scale=scale, l_real=Lk,
        n_kblocks=lk_pad // block_k, block_k=block_k)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, lk_pad, D), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, lk_pad, D), lambda bh, qi: (bh, 0, 0)),
            m_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, lq_pad, D), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp, mp)
    return out.reshape(B, H, lq_pad, D)[:, :, :Lq, :]


# ---------------------------------------------------------------------------
# backward (recompute attention blockwise)
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, m_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, l_real: int,
                lq_real: int, n_qblocks: int, block_q: int,
                broadcast_q: bool):
    """Grid over (B*H,). Recomputes softmax per (q-block) with full K in
    VMEM; accumulates dk/dv across q blocks, writes dq per block."""
    k = k_ref[0]                                        # [Lk, D]
    v = v_ref[0]

    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        o = o_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if broadcast_q:
            mblk = m_ref[0]                             # [1, Lk]
        else:
            mblk = m_ref[0, pl.ds(qi * block_q, block_q), :]  # [BQ, Lk]
        masked = mblk != 0
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(masked, MASK_FILL_VALUE, s)
        s = jnp.where(j >= l_real, PAD_NEG, s)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        # rows beyond the real query length contribute nothing
        qrow = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), dimension=0)
        row_valid = (qrow < lq_real).astype(jnp.float32)
        dv_acc = dv_acc + jax.lax.dot_general(
            (p * row_valid).astype(v.dtype), do.astype(v.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dpart = jax.lax.dot_general(do.astype(v.dtype), v,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=1, keepdims=True)
        ds = p * (dpart - delta) * scale
        # masked/padded lanes carry no score gradient (where() semantics)
        ds = jnp.where(masked | (j >= l_real), 0.0, ds) * row_valid
        dsd = ds.astype(k.dtype)
        dq = jax.lax.dot_general(dsd, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, pl.ds(qi * block_q, block_q), :] = dq.astype(dq_ref.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            dsd, q.astype(k.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk_acc, dv_acc = jax.lax.fori_loop(0, n_qblocks, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _bwd(scale, res, g):
    q, k, v, mask, o = res
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    block_q, block_k = _block_sizes(Lq, Lk)
    lq_pad = _round_up(Lq, block_q)
    lk_pad = _round_up(Lk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - Lq), (0, 0))).reshape(B * H, lq_pad, D)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0))).reshape(B * H, lk_pad, D)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - Lk), (0, 0))).reshape(B * H, lk_pad, D)
    dop = jnp.pad(g, ((0, 0), (0, 0), (0, lq_pad - Lq), (0, 0))).reshape(B * H, lq_pad, D)
    op = jnp.pad(o, ((0, 0), (0, 0), (0, lq_pad - Lq), (0, 0))).reshape(B * H, lq_pad, D)
    mp = _pad_mask(mask, lq_pad, lk_pad)
    broadcast_q = mp.shape[1] == 1
    m_rows = mp.shape[1]

    kern = functools.partial(
        _bwd_kernel, scale=scale, l_real=Lk, lq_real=Lq,
        n_qblocks=lq_pad // block_q, block_q=block_q,
        broadcast_q=broadcast_q)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, lq_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, lk_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, lk_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, lq_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, lq_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, m_rows, lk_pad), lambda bh: (bh // H, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, lq_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, lk_pad, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, lk_pad, D), lambda bh: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, lq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, lk_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, lk_pad, D), v.dtype),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, dop, op, mp)
    dq = dq.reshape(B, H, lq_pad, D)[:, :, :Lq, :]
    dk = dk.reshape(B, H, lk_pad, D)[:, :, :Lk, :]
    dv = dv.reshape(B, H, lk_pad, D)[:, :, :Lk, :]
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, mask, scale):
    return _fwd(q, k, v, mask, scale)


def _flash_fwd(q, k, v, mask, scale):
    o = _fwd(q, k, v, mask, scale)
    return o, (q, k, v, mask, o)


_flash_attention.defvjp(_flash_fwd, _bwd)


def pallas_masked_attention(q, k, v, key_mask: Optional[jnp.ndarray],
                            scale: float) -> jnp.ndarray:
    """Drop-in for modules.masked_softmax_attention. Accepts the same mask
    forms: None, a [B, Lk] key-pad mask (True = masked; NOT assumed
    tail-contiguous — early-fusion concatenations pad mid-sequence), or a
    full [B, Lq, Lk] block mask (multitoken MBT variants)."""
    B = q.shape[0]
    Lk = k.shape[2]
    if key_mask is None:
        m = jnp.zeros((B, 1, Lk), jnp.int8)
    elif key_mask.ndim == 2:
        m = key_mask[:, None, :].astype(jnp.int8)
    else:
        m = key_mask.astype(jnp.int8)
    return _flash_attention(q, k, v, m, 1.0 / scale)
