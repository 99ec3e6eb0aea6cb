"""Pallas row-block-skipped affine: y = x @ W + b with per-row-block
validity flags (forward + custom VJP), plus an LN-fused variant
y = StdLN(x) @ W + b that folds the attention pre-norm into the same pass.

Used for the q/k/v projections of self-attention over length-padded
streams (modules.MultiHeadAttention): with TIE-len padding, roughly half
of every [B*L, C] projection matmul multiplies rows the attention then
masks — the flash kernel skips them as keys/queries, but the projections
themselves were still full-size XLA matmuls. Blocks whose rows are all
padding emit zeros forward (finite values the masked attention never
selects) and zero dx backward, and contribute nothing to dW/db — exact,
because padded rows carry zero cotangents (nothing downstream reads them).

The LN-fused variant additionally saves the separate StdLayerNorm
HBM round-trip (read + write of the full [B, L, C] stream, and its
backward) per encoder layer: the pre-norm is recomputed in VMEM from the
raw residual stream in both passes, flash-style, with the same Bessel-std
semantics as kernels/ffn.py (models/modules.py StdLayerNorm).

Layout mirrors kernels/ffn.py: 256-row blocks, sequential grid, parameter
gradients accumulated across blocks in the output refs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ffn import LN_EPS, VAR_FLOOR, _ln_f32

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


def _fwd_ln_kernel(valid_ref, x_ref, g_ref, bt_ref, w_ref, b_ref,
                   q_ref, k_ref, v_ref, *, n: int):
    """Three separate q/k/v output refs (not one [R, 3C] buffer): the
    attention custom call needs packed per-projection operands, and a
    concatenated output would make XLA materialize three strided-slice
    copies of the full stream per layer (measured ~3 ms/step)."""
    r = pl.program_id(0)

    @pl.when(valid_ref[r] == 0)
    def _skip():
        q_ref[...] = jnp.zeros_like(q_ref[...])
        k_ref[...] = jnp.zeros_like(k_ref[...])
        v_ref[...] = jnp.zeros_like(v_ref[...])

    @pl.when(valid_ref[r] != 0)
    def _compute():
        x = x_ref[...]
        dt = x.dtype
        ln, _, _, _, _, _ = _ln_f32(x.astype(jnp.float32),
                                    g_ref[0].astype(jnp.float32),
                                    bt_ref[0].astype(jnp.float32), n)
        y = jax.lax.dot_general(ln.astype(dt), w_ref[...].astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y.astype(dt) + b_ref[0].astype(dt)
        C = q_ref.shape[1]
        q_ref[...] = y[:, :C]
        k_ref[...] = y[:, C:2 * C]
        v_ref[...] = y[:, 2 * C:]


def _bwd_ln_kernel(valid_ref, x_ref, g_ref, bt_ref, w_ref,
                   dq_ref, dk_ref, dv_ref,
                   dx_ref, dg_ref, dbt_ref, dw_ref, db_ref, *, n: int):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        dbt_ref[...] = jnp.zeros_like(dbt_ref[...])
        dw_ref[...] = jnp.zeros_like(dw_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    @pl.when(valid_ref[r] == 0)
    def _skip():
        dx_ref[...] = jnp.zeros_like(dx_ref[...])

    @pl.when(valid_ref[r] != 0)
    def _compute():
        x = x_ref[...]
        dt = x.dtype
        gamma = g_ref[0].astype(jnp.float32)
        _, xhat, c, sd, var, _mu = _ln_f32(x.astype(jnp.float32), gamma,
                                           bt_ref[0].astype(jnp.float32), n)
        ln = (xhat * gamma + bt_ref[0].astype(jnp.float32)).astype(dt)
        dy = jnp.concatenate([dq_ref[...], dk_ref[...], dv_ref[...]],
                             axis=1).astype(jnp.float32)
        dyd = dy.astype(dt)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dw_ref[...] += jax.lax.dot_general(
            ln, dyd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln = jax.lax.dot_general(
            dyd, w_ref[...].astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # StdLayerNorm backward — same math as kernels/ffn.py:203-213
        dg_ref[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
        dbt_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
        dxhat = dln * gamma
        xmu = xhat / c
        A = jnp.sum(dxhat * xmu, axis=1, keepdims=True)
        flag = (var > VAR_FLOOR).astype(jnp.float32)
        dx = (c * (dxhat - jnp.mean(dxhat, axis=1, keepdims=True))
              - (c * c) * A * xmu * flag / ((n - 1) * sd))
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


def _call_ln_fwd(x2, gamma, beta, w, b, valid):
    R, Cin = x2.shape
    Cout = w.shape[1]
    C = Cout // 3
    rp = _round_up(R, BLOCK_R)
    xp = jnp.pad(x2, ((0, rp - R), (0, 0)))
    outs = pl.pallas_call(
        functools.partial(_fwd_ln_kernel, n=Cin),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rp // BLOCK_R,),
            in_specs=[
                pl.BlockSpec((BLOCK_R, Cin), lambda r, v: (r, 0)),
                pl.BlockSpec((1, Cin), lambda r, v: (0, 0)),
                pl.BlockSpec((1, Cin), lambda r, v: (0, 0)),
                pl.BlockSpec((Cin, Cout), lambda r, v: (0, 0)),
                pl.BlockSpec((1, Cout), lambda r, v: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((BLOCK_R, C), lambda r, v: (r, 0))] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct((rp, C), x2.dtype)] * 3,
        interpret=_interpret(),
    )(valid, xp, gamma[None, :], beta[None, :], w, b[None, :])
    return tuple(o[:R] for o in outs)


def _call_ln_bwd(x2, gamma, beta, w, valid, dq, dk, dv):
    R, Cin = x2.shape
    Cout = w.shape[1]
    C = Cout // 3
    rp = _round_up(R, BLOCK_R)
    xp = jnp.pad(x2, ((0, rp - R), (0, 0)))
    pads = [jnp.pad(d, ((0, rp - R), (0, 0))) for d in (dq, dk, dv)]
    row_in = lambda r, v: (r, 0)
    const = lambda r, v: (0, 0)
    dx, dg, dbt, dw, db = pl.pallas_call(
        functools.partial(_bwd_ln_kernel, n=Cin),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rp // BLOCK_R,),
            in_specs=[
                pl.BlockSpec((BLOCK_R, Cin), row_in),
                pl.BlockSpec((1, Cin), const),
                pl.BlockSpec((1, Cin), const),
                pl.BlockSpec((Cin, Cout), const),
                pl.BlockSpec((BLOCK_R, C), row_in),
                pl.BlockSpec((BLOCK_R, C), row_in),
                pl.BlockSpec((BLOCK_R, C), row_in),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_R, Cin), row_in),
                pl.BlockSpec((1, Cin), const),
                pl.BlockSpec((1, Cin), const),
                pl.BlockSpec((Cin, Cout), const),
                pl.BlockSpec((1, Cout), const),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rp, Cin), x2.dtype),
            jax.ShapeDtypeStruct((1, Cin), jnp.float32),
            jax.ShapeDtypeStruct((1, Cin), jnp.float32),
            jax.ShapeDtypeStruct((Cin, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
        ],
        interpret=_interpret(),
    )(valid, xp, gamma[None, :], beta[None, :], w, *pads)
    return dx[:R], dg[0], dbt[0], dw, db[0]


@jax.custom_vjp
def _fused_ln(x2, gamma, beta, w, b, valid):
    return _call_ln_fwd(x2, gamma, beta, w, b, valid)


def _fused_ln_fwd(x2, gamma, beta, w, b, valid):
    y = _call_ln_fwd(x2, gamma, beta, w, b, valid)
    return y, (x2, gamma, beta, w, valid)


def _fused_ln_bwd(res, g):
    x2, gamma, beta, w, valid = res
    dq, dk, dv = g
    dt = x2.dtype
    dx, dg, dbt, dw, db = _call_ln_bwd(x2, gamma, beta, w, valid,
                                       dq.astype(dt), dk.astype(dt),
                                       dv.astype(dt))
    return (dx, dg.astype(gamma.dtype), dbt.astype(beta.dtype),
            dw.astype(w.dtype), db.astype(x2.dtype), jnp.zeros_like(valid))


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


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


def pallas_rowskip_ln_affine(x, gamma, beta, w, b, block_valid=None):
    """(StdLN(x) [..., Cin] @ w + b) split into its three projection
    thirds: returns (q, k, v), each [..., Cout/3], with the pre-norm fused
    into the same row-block pass (skipping invalid blocks). Emitting three
    packed outputs (not one [.., 3C] buffer) keeps XLA from copying the
    stream to feed the attention custom call. StdLN semantics match
    models/modules.py StdLayerNorm (Bessel std, eps outside the sqrt)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    valid = _block_flags(x2.shape[0], _round_up(x2.shape[0], BLOCK_R),
                         block_valid)
    q, k, v = _fused_ln(x2, gamma, beta, w, b, valid)
    C = w.shape[1] // 3
    return tuple(o.reshape(shape[:-1] + (C,)) for o in (q, k, v))


def xla_rowskip_ln_affine(x, gamma, beta, w, b, block_valid=None):
    """Oracle: XLA StdLN + plain affine, split in thirds (every row)."""
    dt = x.dtype
    ln, _, _, _, _, _ = _ln_f32(x.astype(jnp.float32),
                                gamma.astype(jnp.float32),
                                beta.astype(jnp.float32), x.shape[-1])
    ln = ln.astype(dt)
    y = ln @ w.astype(dt) + b.astype(dt)
    C = w.shape[1] // 3
    return y[..., :C], y[..., C:2 * C], y[..., 2 * C:]
