"""Pallas fused window attention for the Swin encoder (TPU).

The Swin-T forward is ~60% of the flagship step time and runs at <10% of
the chip's matmul rate under generic XLA: every block materializes
[B*nW, nh, 49, 49] fp32 scores plus qkv/attn-out intermediates in HBM
(models/swin.py WindowAttention, reference src/swin_transformer.py:86-178).
This kernel fuses the whole window-attention block —

    qkv projection -> per-head scores (+relative-position bias, +shifted-
    window mask) -> softmax -> @v -> output projection

— into one VMEM-resident pass over groups of windows. Inputs are the
pre-windowed tokens [I, N, C] (I = B * windows/image, N = 49); the window
partition/roll stays in XLA where it fuses with the surrounding layernorms.

Gradients: the swin trunk is frozen in the flagship config (stop_gradient,
tri_mbt_vsltcls.py:208-209) so the kernel's backward is rarely taken; when
it is (--img-pretrain No paths), a custom VJP recomputes the block with the
XLA reference formula and differentiates that — identical math, no
hand-written backward kernel needed.
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

PAD_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA reference formula (also the VJP recompute path)
# ---------------------------------------------------------------------------

def xla_window_attention(xw, wqkv, bqkv, wproj, bproj, bias, smask,
                         num_heads: int):
    """xw [I, N, C]; bias [nh, N, N] f32; smask [M, N, N] bool or None with
    M = windows/image (instance i uses smask[i % M])."""
    I, N, C = xw.shape
    dh = C // num_heads
    qkv = xw @ wqkv.astype(xw.dtype) + bqkv.astype(xw.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(I, N, num_heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(I, N, num_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(I, N, num_heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / math.sqrt(dh) + bias[None].astype(s.dtype)
    if smask is not None:
        # tile per image: instance i uses mask (i % M)
        sm = jnp.tile(smask, (I // smask.shape[0], 1, 1))
        s = jnp.where(sm[:, None], MASK_FILL_VALUE, s)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(I, N, C)
    return o @ wproj.astype(o.dtype) + bproj.astype(o.dtype)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            smask_ref, o_ref, *, nh: int, n_real: int, scale: float,
            has_mask: bool):
    x = x_ref[...]                                    # [G, Np, C]
    G, Np, C = x.shape
    dh = C // nh
    x2 = x.reshape(G * Np, C)
    qkv = jax.lax.dot_general(
        x2, wqkv_ref[...].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0].astype(jnp.float32)       # [G*Np, 3C]
    qkv = qkv.astype(x.dtype).reshape(G, Np, 3 * C)

    col = jax.lax.broadcasted_iota(jnp.int32, (G, Np, Np), dimension=2)
    outs = []
    for h in range(nh):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, C + h * dh:C + (h + 1) * dh]
        v = qkv[:, :, 2 * C + h * dh:2 * C + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [G, Np, Np]
        s = s + bias_ref[h][None].astype(jnp.float32)
        if has_mask:
            s = jnp.where(smask_ref[...] != 0, MASK_FILL_VALUE, s)
        s = jnp.where(col >= n_real, PAD_NEG, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [G, Np, dh]
        outs.append(o.astype(x.dtype))
    out = jnp.concatenate(outs, axis=-1)                  # [G, Np, C]
    out2 = jax.lax.dot_general(
        out.reshape(G * Np, C), wproj_ref[...].astype(x.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out2 = out2 + bproj_ref[0].astype(jnp.float32)
    o_ref[...] = out2.astype(o_ref.dtype).reshape(G, Np, C)


def _pick_group(I: int, M: int, C: int) -> int:
    """Windows per grid step: divide I, and align with the M-periodic shift
    mask (G % M == 0 tiles one mask block; M % G == 0 strides through it).
    Cap VMEM: activations ~ G*64*(6C)*4B."""
    budget = 6 * 1024 * 1024
    for g in (32, 16, 8, 4, 2, 1):
        if I % g or (g % M and M % g):
            continue
        if g * 64 * 6 * C * 4 <= budget:
            return g
    return 1


def _pallas_window_attention(xw, wqkv, bqkv, wproj, bproj, bias, smask,
                             num_heads: int):
    I, N, C = xw.shape
    nh = num_heads
    dh = C // nh
    Np = _round_up(N, 16)
    M = 1 if smask is None else smask.shape[0]
    G = _pick_group(I, M, C)

    xp = jnp.pad(xw, ((0, 0), (0, Np - N), (0, 0)))
    bias_p = jnp.pad(bias.astype(jnp.float32),
                     ((0, 0), (0, Np - N), (0, Np - N)))
    if smask is None:
        sm = jnp.zeros((1, Np, Np), jnp.int8)
        sm_spec = pl.BlockSpec((1, Np, Np), lambda g: (0, 0, 0))
        has_mask = False
    else:
        sm = jnp.pad(smask.astype(jnp.int8),
                     ((0, 0), (0, Np - N), (0, Np - N)))
        if G % M == 0:
            sm = jnp.tile(sm, (G // M, 1, 1))          # one block, reused
            sm_spec = pl.BlockSpec((G, Np, Np), lambda g: (0, 0, 0))
        else:                                          # M % G == 0
            sm_spec = pl.BlockSpec((G, Np, Np),
                                   lambda g, _m=M // G: (g % _m, 0, 0))
        has_mask = True

    kern = functools.partial(_kernel, nh=nh, n_real=N,
                             scale=1.0 / math.sqrt(dh), has_mask=has_mask)
    out = pl.pallas_call(
        kern,
        grid=(I // G,),
        in_specs=[
            pl.BlockSpec((G, Np, C), lambda g: (g, 0, 0)),
            pl.BlockSpec((C, 3 * C), lambda g: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda g: (0, 0)),
            pl.BlockSpec((C, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((nh, Np, Np), lambda g: (0, 0, 0)),
            sm_spec,
        ],
        out_specs=pl.BlockSpec((G, Np, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((I, Np, C), xw.dtype),
        interpret=_interpret(),
    )(xp, wqkv, bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1), bias_p, sm)
    return out[:, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(xw, wqkv, bqkv, wproj, bproj, bias, smask, num_heads):
    return _pallas_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                    smask, num_heads)


def _fused_fwd(xw, wqkv, bqkv, wproj, bproj, bias, smask, num_heads):
    out = _pallas_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                   smask, num_heads)
    return out, (xw, wqkv, bqkv, wproj, bproj, bias, smask)


def _fused_bwd(num_heads, res, g):
    xw, wqkv, bqkv, wproj, bproj, bias, smask = res
    if smask is None:
        f = lambda *a: xla_window_attention(*a, None, num_heads)
        _, vjp = jax.vjp(f, xw, wqkv, bqkv, wproj, bproj, bias)
        return (*vjp(g), None)
    f = lambda *a: xla_window_attention(*a, num_heads)
    _, vjp = jax.vjp(f, xw, wqkv, bqkv, wproj, bproj, bias, smask)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def pallas_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                            smask: Optional[jnp.ndarray], num_heads: int):
    """Drop-in for xla_window_attention (same signature/semantics)."""
    return _fused(xw, wqkv, bqkv, wproj, bproj, bias, smask, num_heads)
