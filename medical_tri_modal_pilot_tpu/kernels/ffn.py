"""Pallas fused pre-norm FFN block (forward + custom VJP) for the
transformer encoder layers.

Computes, entirely in VMEM per row block:

    y = x + drop(W2 @ drop(relu(W1 @ StdLN(x) + b1)) + b2)

where StdLN is the reference's Bessel-corrected LayerNorm
(models/modules.py StdLayerNorm; transformer/module.py:57-80 semantics).
Under XLA this half-layer costs three HBM round-trips of the [R, d_ff]
hidden (forward write, backward read, dropout-mask write) plus two
[R, d_ff] u32 RNG draws; the profile showed them at ~15% of the flagship
train step even with the cheap rbg generator.

Dropout inside the kernel uses the TPU-native PRNG
(pltpu.prng_seed/prng_random_bits) seeded per (step, layer, row-block);
the backward re-seeds identically and regenerates the exact masks, so
nothing mask-shaped ever touches HBM. Mask semantics match nn.Dropout:
keep with probability q = 1-p, scale kept values by 1/q.

The backward recomputes LN and the hidden from x (flash-style), and
accumulates parameter gradients across the sequential row-block grid in
the output refs (init at block 0, += after).

CPU note: interpret mode has no prng_seed lowering, so the fused op is
TPU-only for the dropout path; the deterministic path runs in interpret
mode and is compared against the XLA module composition in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6
VAR_FLOOR = 1e-24
BLOCK_R = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_f32(xf, gamma, beta, n):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.sum((xf - mu) ** 2, axis=-1, keepdims=True) / (n - 1)
    sd = jnp.sqrt(jnp.maximum(var, VAR_FLOOR))
    c = 1.0 / (sd + LN_EPS)
    xhat = (xf - mu) * c
    return xhat * gamma + beta, xhat, c, sd, var, mu


def _seed_block(seed_ref, r):
    """Per-row-block seeding: Mosaic's prng_set_seed takes at most two
    32-bit words, so the block index is hashed into them (Knuth
    multiplicative) instead of passed as a third word."""
    pltpu.prng_seed(seed_ref[0] + r * np.int32(-1640531527),
                    seed_ref[1] ^ (r * np.int32(40503)))


def _keep_mask(shape, q: float):
    # unsigned u32 compare has no Mosaic lowering on this target: flip the
    # sign bit and compare signed (u < t  <=>  (u^MSB) <s (t^MSB))
    bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits(shape),
                                        jnp.int32)
    thr = min(int(q * 4294967296.0), 4294967295)
    thr_s = np.int32((thr ^ 0x80000000) - 0x100000000
                     if (thr ^ 0x80000000) >= 0x80000000
                     else (thr ^ 0x80000000))
    return (bits ^ np.int32(-2147483648)) < thr_s


def _fwd_kernel(seed_ref, valid_ref, x_ref, g_ref, bt_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, y_ref, *, p: float, training: bool, n: int):
    r = pl.program_id(0)

    # per-sample row-block skip: blocks whose rows all lie beyond their
    # sample's valid length pass the residual stream through untouched —
    # padded rows are row-local here and masked as keys everywhere
    # downstream, so their FFN output is never read (and their cotangents
    # are zero)
    @pl.when(valid_ref[r] == 0)
    def _skip():
        y_ref[...] = x_ref[...]

    @pl.when(valid_ref[r] != 0)
    def _compute():
        x = x_ref[...]
        dt = x.dtype
        xf = x.astype(jnp.float32)
        ln, _, _, _, _, _ = _ln_f32(xf, g_ref[0].astype(jnp.float32),
                                    bt_ref[0].astype(jnp.float32), n)
        ln = ln.astype(dt)
        h = jax.lax.dot_general(ln, w1_ref[...].astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jnp.maximum(h.astype(dt) + b1_ref[0].astype(dt), 0)
        if training and p > 0.0:
            q = 1.0 - p
            _seed_block(seed_ref, r)
            keep1 = _keep_mask(h.shape, q)
            h = jnp.where(keep1, h / jnp.asarray(q, dt), jnp.zeros_like(h))
        z = jax.lax.dot_general(h.astype(dt), w2_ref[...].astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        z = z.astype(dt) + b2_ref[0].astype(dt)
        if training and p > 0.0:
            keep2 = _keep_mask(z.shape, q)
            z = jnp.where(keep2, z / jnp.asarray(q, dt), jnp.zeros_like(z))
        y_ref[...] = x + z


def _bwd_kernel(seed_ref, valid_ref, x_ref, g_ref, bt_ref, w1_ref,
                b1_ref, w2_ref, b2_ref, dy_ref, dx_ref, dg_ref, dbt_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, *, p: float,
                training: bool, n: int):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        dbt_ref[...] = jnp.zeros_like(dbt_ref[...])
        dw1_ref[...] = jnp.zeros_like(dw1_ref[...])
        db1_ref[...] = jnp.zeros_like(db1_ref[...])
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])

    # skipped block: the forward passed the residual through (y = x), so
    # dx = dy and no weight-gradient contribution (cotangents of padded
    # rows are zero anyway — nothing downstream reads them)
    @pl.when(valid_ref[r] == 0)
    def _skip():
        dx_ref[...] = dy_ref[...]

    @pl.when(valid_ref[r] != 0)
    def _compute():
        _bwd_block(seed_ref, r, x_ref, g_ref, bt_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, dy_ref, dx_ref, dg_ref, dbt_ref, dw1_ref, db1_ref,
                   dw2_ref, db2_ref, p=p, training=training, n=n)


def _bwd_block(seed_ref, r, x_ref, g_ref, bt_ref, w1_ref, b1_ref, w2_ref,
               b2_ref, dy_ref, dx_ref, dg_ref, dbt_ref, dw1_ref, db1_ref,
               dw2_ref, db2_ref, *, p: float, training: bool, n: int):
    x = x_ref[...]
    dt = x.dtype
    gamma = g_ref[0].astype(jnp.float32)
    beta = bt_ref[0].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    ln_f, xhat, c, sd, var, _mu = _ln_f32(xf, gamma, beta, n)
    ln = ln_f.astype(dt)
    h_pre = jax.lax.dot_general(ln, w1_ref[...].astype(dt),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    h_pre = h_pre.astype(dt) + b1_ref[0].astype(dt)
    rmask = (h_pre.astype(jnp.float32) > 0.0)
    h = jnp.maximum(h_pre, 0)
    if training and p > 0.0:
        q = 1.0 - p
        _seed_block(seed_ref, r)
        keep1 = _keep_mask(h.shape, q)
        h_d = jnp.where(keep1, h / jnp.asarray(q, dt), jnp.zeros_like(h))
        keep2 = _keep_mask((x.shape[0], x.shape[1]), q)
    else:
        h_d = h

    dy = dy_ref[...].astype(jnp.float32)
    if training and p > 0.0:
        qf = jnp.float32(1.0 - p)
        dz = jnp.where(keep2, dy / qf, 0.0)
    else:
        dz = dy
    dzd = dz.astype(dt)
    db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        h_d, dzd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_d = jax.lax.dot_general(
        dzd, w2_ref[...].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if training and p > 0.0:
        dh = jnp.where(keep1, dh_d / jnp.float32(1.0 - p), 0.0)
    else:
        dh = dh_d
    dh = jnp.where(rmask, dh, 0.0)
    dhd = dh.astype(dt)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(
        ln, dhd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dln = jax.lax.dot_general(
        dhd, w1_ref[...].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # StdLayerNorm backward (Bessel std, eps OUTSIDE the sqrt, var floor):
    # xhat = (x-mu)*c, c = 1/(sd+eps) =>
    # dx = c*(dxhat - mean(dxhat)) - c^2 * A * (x-mu)/((n-1)*sd) [var>floor]
    dg_ref[...] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    dbt_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * gamma
    xmu = xhat / c                       # x - mu (exact: xhat = xmu*c)
    A = jnp.sum(dxhat * xmu, axis=1, keepdims=True)
    flag = (var > VAR_FLOOR).astype(jnp.float32)
    dx = (c * (dxhat - jnp.mean(dxhat, axis=1, keepdims=True))
          - (c * c) * A * xmu * flag / ((n - 1) * sd))
    dx_ref[...] = (dy + dx).astype(dt)


def _masks_kernel(seed_ref, x_ref, k1_ref, k2_ref, *, p: float):
    """Debug/test helper: emit the exact keep masks the fused kernel
    generates for this seed (same seeding + draw order as _fwd_kernel)."""
    r = pl.program_id(0)
    q = 1.0 - p
    _seed_block(seed_ref, r)
    k1_ref[...] = _keep_mask(k1_ref.shape, q).astype(jnp.int8)
    k2_ref[...] = _keep_mask(k2_ref.shape, q).astype(jnp.int8)


def dropout_masks(R: int, F: int, C: int, seed, p: float):
    """The keep masks pallas_ffn would use (TPU only; test oracle)."""
    rp = _round_up(R, BLOCK_R)
    k1, k2 = pl.pallas_call(
        functools.partial(_masks_kernel, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rp // BLOCK_R,),
            in_specs=[pl.BlockSpec((BLOCK_R, 8), lambda r, s: (r, 0))],
            out_specs=[pl.BlockSpec((BLOCK_R, F), lambda r, s: (r, 0)),
                       pl.BlockSpec((BLOCK_R, C), lambda r, s: (r, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((rp, F), jnp.int8),
                   jax.ShapeDtypeStruct((rp, C), jnp.int8)],
        interpret=_interpret(),
    )(seed.astype(jnp.int32), jnp.zeros((rp, 8), jnp.float32))
    return k1[:R] != 0, k2[:R] != 0


def _block_valid_flags(R: int, rp: int, block_valid):
    """[rp/BLOCK_R] int32 flags; None -> all real blocks valid (tail pad
    blocks are always skipped — their rows are sliced off by the caller)."""
    nb = rp // BLOCK_R
    if block_valid is None:
        nreal = (R + BLOCK_R - 1) // BLOCK_R
        return jnp.concatenate([
            jnp.ones((nreal,), jnp.int32),
            jnp.zeros((nb - nreal,), jnp.int32)])
    bv = block_valid.reshape(-1).astype(jnp.int32)
    return jnp.concatenate(
        [bv, jnp.zeros((nb - bv.shape[0],), jnp.int32)])


def _call_fwd(x2, gamma, beta, w1, b1, w2, b2, seed, valid, p, training):
    R, C = x2.shape
    F = w1.shape[1]
    rp = _round_up(R, BLOCK_R)
    xp = jnp.pad(x2, ((0, rp - R), (0, 0)))
    kern = functools.partial(_fwd_kernel, p=p, training=training, n=C)
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rp // BLOCK_R,),
            in_specs=[
                pl.BlockSpec((BLOCK_R, C), lambda r, s, v: (r, 0)),
                pl.BlockSpec((1, C), lambda r, s, v: (0, 0)),
                pl.BlockSpec((1, C), lambda r, s, v: (0, 0)),
                pl.BlockSpec((C, F), lambda r, s, v: (0, 0)),
                pl.BlockSpec((1, F), lambda r, s, v: (0, 0)),
                pl.BlockSpec((F, C), lambda r, s, v: (0, 0)),
                pl.BlockSpec((1, C), lambda r, s, v: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK_R, C), lambda r, s, v: (r, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((rp, C), x2.dtype),
        interpret=_interpret(),
    )(seed, valid, xp, gamma[None, :], beta[None, :], w1, b1[None, :], w2,
      b2[None, :])
    return y[:R]


def _call_bwd(x2, gamma, beta, w1, b1, w2, b2, seed, valid, p, training, dy):
    R, C = x2.shape
    F = w1.shape[1]
    rp = _round_up(R, BLOCK_R)
    xp = jnp.pad(x2, ((0, rp - R), (0, 0)))
    dyp = jnp.pad(dy, ((0, rp - R), (0, 0)))
    kern = functools.partial(_bwd_kernel, p=p, training=training, n=C)
    const = lambda r, s, v: (0, 0)
    row = lambda r, s, v: (r, 0)
    dx, dg, dbt, dw1, db1, dw2, db2 = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rp // BLOCK_R,),
            in_specs=[
                pl.BlockSpec((BLOCK_R, C), row),
                pl.BlockSpec((1, C), const),
                pl.BlockSpec((1, C), const),
                pl.BlockSpec((C, F), const),
                pl.BlockSpec((1, F), const),
                pl.BlockSpec((F, C), const),
                pl.BlockSpec((1, C), const),
                pl.BlockSpec((BLOCK_R, C), row),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_R, C), row),
                pl.BlockSpec((1, C), const),
                pl.BlockSpec((1, C), const),
                pl.BlockSpec((C, F), const),
                pl.BlockSpec((1, F), const),
                pl.BlockSpec((F, C), const),
                pl.BlockSpec((1, C), const),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rp, C), x2.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(seed, valid, xp, gamma[None, :], beta[None, :], w1, b1[None, :], w2,
      b2[None, :], dyp)
    return (dx[:R], dg[0].astype(gamma.dtype), dbt[0].astype(beta.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused(x2, gamma, beta, w1, b1, w2, b2, seed, valid, p, training):
    return _call_fwd(x2, gamma, beta, w1, b1, w2, b2, seed, valid, p,
                     training)


def _fused_fwd(x2, gamma, beta, w1, b1, w2, b2, seed, valid, p, training):
    y = _call_fwd(x2, gamma, beta, w1, b1, w2, b2, seed, valid, p, training)
    return y, (x2, gamma, beta, w1, b1, w2, b2, seed, valid)


def _fused_bwd(p, training, res, g):
    x2, gamma, beta, w1, b1, w2, b2, seed, valid = res
    dx, dg, dbt, dw1, db1, dw2, db2 = _call_bwd(
        x2, gamma, beta, w1, b1, w2, b2, seed, valid, p, training,
        g.astype(x2.dtype))
    return (dx, dg, dbt, dw1, db1, dw2, db2,
            jnp.zeros_like(seed), jnp.zeros_like(valid))


_fused.defvjp(_fused_fwd, _fused_bwd)


def pallas_ffn(x, gamma, beta, w1, b1, w2, b2, *, p: float,
               deterministic: bool, seed, block_valid=None) -> jnp.ndarray:
    """x: [..., C]; returns x + FFN(StdLN(x)) with in-kernel dropout.

    ``seed``: int32[2] (ignored when deterministic or p == 0). The same
    seed must not be reused across layers/steps — the caller derives it
    from the flax dropout rng.

    ``block_valid``: optional int [..., rows/BLOCK_R] per-row-block
    validity flags (any leading shape, flattened in row order): 0-blocks
    skip the FFN entirely and pass the residual through — exact for rows
    beyond a sample's valid length, which are row-local here and masked as
    keys everywhere downstream (zero cotangents)."""
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    training = (not deterministic) and p > 0.0
    if seed is None:
        seed = jnp.zeros((2,), jnp.int32)
    R = x2.shape[0]
    valid = _block_valid_flags(R, _round_up(R, BLOCK_R), block_valid)
    y = _fused(x2, gamma, beta, w1, b1, w2, b2,
               seed.astype(jnp.int32), valid, float(p), bool(training))
    return y.reshape(shape)


def xla_ffn(x, gamma, beta, w1, b1, w2, b2, *, p: float,
            deterministic: bool, seed, block_valid=None) -> jnp.ndarray:
    """Pure-jnp reference of the same math (test oracle; dropout masks
    differ from the kernel's TPU PRNG, so only deterministic comparisons
    are exact)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    ln, _, _, _, _, _ = _ln_f32(xf, gamma.astype(jnp.float32),
                                beta.astype(jnp.float32), x.shape[-1])
    ln = ln.astype(dt)
    h = jnp.maximum(jnp.dot(ln, w1.astype(dt)) + b1.astype(dt), 0)
    z = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    return x + z
