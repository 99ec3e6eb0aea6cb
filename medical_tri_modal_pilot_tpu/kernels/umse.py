"""Pallas fused UMSE TIE-token embedding (SURVEY.md §7.3's "second small
kernel").

The UMSE stem computes, per TIE token (tri_mbt_vsltcls.py:183-198):

    relu(LN(value*Wv + bv)) + relu(LN(time*Wt + bt)) + feat_table[feat_id]

Under XLA this chain materializes ~8 [B, L, D] intermediates in HBM (two
degenerate [R,1]x[1,D] "matmuls", two layernorms, relu, embedding gather,
two adds). The kernel computes the whole token embedding in VMEM per row
block and writes only the final [B, L, D] — a pure bandwidth win on the
hot path (every live model embeds the TIE stream every step).

The feature-id gather becomes a one-hot [R, 20] x [20, D] matmul
(TPU-static; gathers don't lower well in Mosaic). Gradients: custom VJP
differentiates the pure-jnp formula (xla_umse) — identical math.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5    # torch nn.LayerNorm default (reference stems are torch builtins)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stem(x_scalar, w, b, scale, bias, dtype):
    """relu(LN(x*w + b)) for a column of scalars — matches
    MLPStem = Dense(1->D) -> LayerNorm -> relu numerics: the affine runs in
    ``dtype`` (bf16 under --precision bf16), LN statistics in f32."""
    h = (x_scalar.astype(dtype) * w.astype(dtype)[0][None, :]
         + b.astype(dtype)[None, :])
    h32 = h.astype(jnp.float32)
    mu = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(h32 * h32, axis=-1, keepdims=True)
                      - mu * mu, 0.0)
    y = (h32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * scale.astype(jnp.float32)[None, :] \
        + bias.astype(jnp.float32)[None, :]
    return jnp.maximum(y, 0.0)


def xla_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype):
    """Pure-jnp reference (also the VJP recompute path).
    x: [B, L, 3] (time, value, feat_id); returns [B, L, D] in ``dtype``."""
    B, L, _ = x.shape
    D = wv.shape[1]
    t = x[:, :, 0].reshape(B * L, 1)
    v = x[:, :, 1].reshape(B * L, 1)
    fid = x[:, :, 2].astype(jnp.int32).reshape(B * L)
    ev = _stem(v, wv, bv, sv, bbv, dtype)
    et = _stem(t, wt, bt, st, bbt, dtype)
    ef = table[fid].astype(jnp.float32)
    return (ev + et + ef).astype(dtype).reshape(B, L, D)


def _kernel(t_ref, v_ref, id_ref, wv_ref, bv_ref, sv_ref, bbv_ref,
            wt_ref, bt_ref, st_ref, bbt_ref, table_ref, o_ref, *,
            n_ids: int, dtype):
    tcol = t_ref[...]                                   # [Rb, 1] f32
    vcol = v_ref[...]
    ev = _stem(vcol, wv_ref[...], bv_ref[0], sv_ref[0], bbv_ref[0], dtype)
    et = _stem(tcol, wt_ref[...], bt_ref[0], st_ref[0], bbt_ref[0], dtype)
    ids = id_ref[...].astype(jnp.int32)                 # [Rb, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], n_ids), 1)
    onehot = (lane == ids).astype(table_ref.dtype)      # [Rb, n_ids]
    ef = jax.lax.dot_general(
        onehot, table_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (ev + et + ef).astype(o_ref.dtype)


def _pallas_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype):
    B, L, _ = x.shape
    D = wv.shape[1]
    n_ids = table.shape[0]
    R = B * L
    Rb = 1024
    R_pad = _round_up(R, Rb)
    cols = x.reshape(R, 3)
    cols = jnp.pad(cols, ((0, R_pad - R), (0, 0)))
    t = cols[:, 0:1]
    v = cols[:, 1:2]
    fid = cols[:, 2:3]

    kern = functools.partial(_kernel, n_ids=n_ids, dtype=dtype)
    vec = lambda r: pl.BlockSpec((1, r), lambda i: (0, 0))
    out = pl.pallas_call(
        kern,
        grid=(R_pad // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((Rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((Rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),     # wv [1, D]
            vec(D), vec(D), vec(D),                     # bv, sv, bbv
            pl.BlockSpec((1, D), lambda i: (0, 0)),     # wt
            vec(D), vec(D), vec(D),                     # bt, st, bbt
            pl.BlockSpec((n_ids, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Rb, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R_pad, D), dtype),
        interpret=_interpret(),
    )(t, v, fid, wv, bv.reshape(1, -1), sv.reshape(1, -1),
      bbv.reshape(1, -1), wt, bt.reshape(1, -1), st.reshape(1, -1),
      bbt.reshape(1, -1), table)
    return out[:R].reshape(B, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _fused(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype):
    return _pallas_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype)


def _fused_fwd(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype):
    out = _pallas_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype)
    return out, (x, wv, bv, sv, bbv, wt, bt, st, bbt, table)


def _fused_bwd(dtype, res, g):
    _, vjp = jax.vjp(lambda *a: xla_umse(*a, dtype), *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def pallas_umse(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype):
    """Fused TIE-token embedding; drop-in for xla_umse."""
    return _fused(x, wv, bv, sv, bbv, wt, bt, st, bbt, table, dtype)
