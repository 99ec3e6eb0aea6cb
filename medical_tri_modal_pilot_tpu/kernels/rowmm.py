"""Pallas row-block-skipped affine: y = x @ W + b with per-row-block
validity flags (forward + custom VJP).

Used for the q/k/v projections of self-attention over length-padded
streams (modules.MultiHeadAttention): with TIE-len padding, roughly half
of every [B*L, C] projection matmul multiplies rows the attention then
masks — the flash kernel skips them as keys/queries, but the projections
themselves were still full-size XLA matmuls. Blocks whose rows are all
padding emit zeros forward (finite values the masked attention never
selects) and zero dx backward, and contribute nothing to dW/db — exact,
because padded rows carry zero cotangents (nothing downstream reads them).

Layout mirrors kernels/ffn.py: 256-row blocks, sequential grid, parameter
gradients accumulated across blocks in the output refs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(valid_ref, x_ref, w_ref, b_ref, y_ref):
    r = pl.program_id(0)

    @pl.when(valid_ref[r] == 0)
    def _skip():
        y_ref[...] = jnp.zeros_like(y_ref[...])

    @pl.when(valid_ref[r] != 0)
    def _compute():
        x = x_ref[...]
        dt = x.dtype
        y = jax.lax.dot_general(x, w_ref[...].astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y_ref[...] = y.astype(dt) + b_ref[0].astype(dt)


def _bwd_kernel(valid_ref, x_ref, w_ref, dy_ref, dx_ref, dw_ref, db_ref):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    @pl.when(valid_ref[r] == 0)
    def _skip():
        dx_ref[...] = jnp.zeros_like(dx_ref[...])

    @pl.when(valid_ref[r] != 0)
    def _compute():
        x = x_ref[...]
        dt = x.dtype
        dy = dy_ref[...].astype(jnp.float32)
        dyd = dy.astype(dt)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dw_ref[...] += jax.lax.dot_general(
            x, dyd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = jax.lax.dot_general(
            dyd, w_ref[...].astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[...] = dx.astype(dt)


def _block_flags(R: int, rp: int, block_valid):
    nb = rp // BLOCK_R
    if block_valid is None:
        nreal = (R + BLOCK_R - 1) // BLOCK_R
        return jnp.concatenate([jnp.ones((nreal,), jnp.int32),
                                jnp.zeros((nb - nreal,), jnp.int32)])
    bv = block_valid.reshape(-1).astype(jnp.int32)
    return jnp.concatenate([bv, jnp.zeros((nb - bv.shape[0],), jnp.int32)])


def _call_fwd(x2, w, b, valid):
    R, Cin = x2.shape
    Cout = w.shape[1]
    rp = _round_up(R, BLOCK_R)
    xp = jnp.pad(x2, ((0, rp - R), (0, 0)))
    y = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rp // BLOCK_R,),
            in_specs=[
                pl.BlockSpec((BLOCK_R, Cin), lambda r, v: (r, 0)),
                pl.BlockSpec((Cin, Cout), lambda r, v: (0, 0)),
                pl.BlockSpec((1, Cout), lambda r, v: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK_R, Cout), lambda r, v: (r, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((rp, Cout), x2.dtype),
        interpret=_interpret(),
    )(valid, xp, w, b[None, :])
    return y[:R]


def _call_bwd(x2, w, valid, dy):
    R, Cin = x2.shape
    Cout = w.shape[1]
    rp = _round_up(R, BLOCK_R)
    xp = jnp.pad(x2, ((0, rp - R), (0, 0)))
    dyp = jnp.pad(dy, ((0, rp - R), (0, 0)))
    row_in = lambda r, v: (r, 0)
    const = lambda r, v: (0, 0)
    dx, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rp // BLOCK_R,),
            in_specs=[
                pl.BlockSpec((BLOCK_R, Cin), row_in),
                pl.BlockSpec((Cin, Cout), const),
                pl.BlockSpec((BLOCK_R, Cout), row_in),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_R, Cin), row_in),
                pl.BlockSpec((Cin, Cout), const),
                pl.BlockSpec((1, Cout), const),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rp, Cin), x2.dtype),
            jax.ShapeDtypeStruct((Cin, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
        ],
        interpret=_interpret(),
    )(valid, xp, w, dyp)
    return dx[:R], dw, db[0]


@jax.custom_vjp
def _fused(x2, w, b, valid):
    return _call_fwd(x2, w, b, valid)


def _fused_fwd(x2, w, b, valid):
    return _call_fwd(x2, w, b, valid), (x2, w, valid)


def _fused_bwd(res, g):
    x2, w, valid = res
    dx, dw, db = _call_bwd(x2, w, valid, g.astype(x2.dtype))
    return dx, dw.astype(w.dtype), db.astype(x2.dtype), \
        jnp.zeros_like(valid)


_fused.defvjp(_fused_fwd, _fused_bwd)


def pallas_rowskip_affine(x, w, b, block_valid=None) -> jnp.ndarray:
    """x [..., Cin] @ w [Cin, Cout] + b, skipping invalid 256-row blocks
    (``block_valid``: int flags over rows in flattened order, any leading
    shape; None = all real rows valid)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    valid = _block_flags(x2.shape[0], _round_up(x2.shape[0], BLOCK_R),
                         block_valid)
    y = _fused(x2, w, b, valid)
    return y.reshape(shape[:-1] + (w.shape[1],))


def xla_rowskip_affine(x, w, b, block_valid=None) -> jnp.ndarray:
    """Oracle: plain affine (computes every row; padded rows are unread)."""
    dt = x.dtype
    return x @ w.astype(dt) + b.astype(dt)
