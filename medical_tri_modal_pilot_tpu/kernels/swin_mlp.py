"""Pallas fused LayerNorm -> MLP -> residual for the Swin blocks.

The second half of every Swin block is y = x + fc2(gelu(fc1(LN(x)))) over
[B*H*W, C] rows (models/swin.py SwinBlock; torchvision swin MLP). Under
XLA the LN output, the [R, 4C] hidden, and the residual each round-trip
HBM; this kernel keeps them in VMEM per row block. Both weight matrices
ride in VMEM (largest stage: 768x3072 bf16 x2 ~= 9.4 MB).

Gradients: custom VJP differentiates the pure-jnp formula (xla_swin_mlp)
— the swin trunk is frozen in the flagship config so this backward is
rarely taken.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5   # torch nn.LayerNorm default (torchvision swin: partial(LayerNorm, eps=1e-5))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| < 1.5e-7) — Mosaic
    has no erf/erfc lowering; well inside the swin torch-parity tolerance."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _branch(x, scale, bias, w1, b1, w2, b2, dtype):
    """fc2(gelu(fc1(LN(x)))) in f32, no residual — the stochastic-depth
    training path scales this before adding it back."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    h = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    h = (h * scale.astype(jnp.float32)[None, :]
         + bias.astype(jnp.float32)[None, :]).astype(dtype)
    h = jax.lax.dot_general(h, w1.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)[None, :]
    h = _gelu_exact(h).astype(dtype)
    o = jax.lax.dot_general(h, w2.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2.astype(jnp.float32)[None, :]
    return o


def _block(x, scale, bias, w1, b1, w2, b2, dtype):
    """x: [R, C] in ``dtype``; LN statistics in f32, matmuls in ``dtype``
    with f32 accumulation — matches nn.LayerNorm/nn.Dense(dtype=dtype)."""
    return x.astype(jnp.float32) + _branch(x, scale, bias, w1, b1, w2, b2,
                                           dtype)


def mlp_branch(x, scale, bias, w1, b1, w2, b2):
    """Branch output WITHOUT the residual (stochastic-depth path)."""
    return _branch(x, scale, bias, w1, b1, w2, b2, x.dtype).astype(x.dtype)


def xla_swin_mlp(x, scale, bias, w1, b1, w2, b2):
    """Pure-jnp reference (also the VJP recompute path). x: [R, C]."""
    return _block(x, scale, bias, w1, b1, w2, b2, x.dtype).astype(x.dtype)


def _kernel(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            dtype):
    o = _block(x_ref[...], s_ref[0], bb_ref[0], w1_ref[...], b1_ref[0],
               w2_ref[...], b2_ref[0], dtype)
    o_ref[...] = o.astype(o_ref.dtype)


def _pallas(x, scale, bias, w1, b1, w2, b2):
    R, C = x.shape
    Ch = w1.shape[1]
    Rb = 512
    R_pad = _round_up(R, Rb)
    xp = jnp.pad(x, ((0, R_pad - R), (0, 0)))
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, dtype=x.dtype),
        grid=(R_pad // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, C), lambda i: (i, 0)),
            vec(C), vec(C),
            pl.BlockSpec((C, Ch), lambda i: (0, 0)),
            vec(Ch),
            pl.BlockSpec((Ch, C), lambda i: (0, 0)),
            vec(C),
        ],
        out_specs=pl.BlockSpec((Rb, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R_pad, C), x.dtype),
        # stage-4 weights (768x3072 f32 both ways) exceed the default 16M
        # scoped-vmem budget on some compile paths; v5e has 128M physical
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        interpret=_interpret(),
    )(xp, scale.reshape(1, -1), bias.reshape(1, -1), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1))
    return out[:R]


@jax.custom_vjp
def _fused(x, scale, bias, w1, b1, w2, b2):
    return _pallas(x, scale, bias, w1, b1, w2, b2)


def _fused_fwd(x, scale, bias, w1, b1, w2, b2):
    return (_pallas(x, scale, bias, w1, b1, w2, b2),
            (x, scale, bias, w1, b1, w2, b2))


def _fused_bwd(res, g):
    _, vjp = jax.vjp(xla_swin_mlp, *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def pallas_swin_mlp(x, scale, bias, w1, b1, w2, b2):
    """Fused LN->fc1->gelu->fc2->residual; drop-in for xla_swin_mlp."""
    return _fused(x, scale, bias, w1, b1, w2, b2)
