"""Fused LN->FFN->residual kernel (kernels/ffn.py) vs the XLA module
composition. Deterministic path runs in interpret mode on CPU; the
dropout path needs the TPU PRNG (no interpret lowering) and is validated
by the TPU kernel-check script + statistical test there."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.kernels.ffn import pallas_ffn, xla_ffn


def _inputs(R=70, C=64, F=256, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, R, C)), dtype)
    gamma = jnp.asarray(rng.normal(1.0, 0.1, C), jnp.float32)
    beta = jnp.asarray(rng.normal(0.0, 0.1, C), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.01, F), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, C)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.01, C), jnp.float32)
    return x, gamma, beta, w1, b1, w2, b2


def test_deterministic_matches_xla():
    args = _inputs()
    out = pallas_ffn(*args, p=0.1, deterministic=True, seed=None)
    ref = xla_ffn(*args, p=0.1, deterministic=True, seed=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_deterministic_matches_module_composition():
    """Against the actual StdLayerNorm+FeedForward modules (the tree the
    fused op replaces computationally)."""
    from medical_tri_modal_pilot_tpu.models.modules import (FeedForward,
                                                            StdLayerNorm)
    x, gamma, beta, w1, b1, w2, b2 = _inputs(seed=3)
    ln = StdLayerNorm(x.shape[-1])
    ffn = FeedForward(x.shape[-1], w1.shape[1], 0.1)
    ln_params = {"params": {"gamma": gamma, "beta": beta}}
    ffn_params = {"params": {"w_1": {"kernel": w1, "bias": b1},
                             "w_2": {"kernel": w2, "bias": b2}}}
    ref = x + ffn.apply(ffn_params, ln.apply(ln_params, x), True)
    out = pallas_ffn(x, gamma, beta, w1, b1, w2, b2,
                     p=0.1, deterministic=True, seed=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_autodiff():
    """Custom VJP (incl. the hand-derived Bessel-LN backward) vs jax
    autodiff of the identical jnp formula, all seven inputs."""
    args = _inputs(seed=5)

    def lp(*a):
        return (pallas_ffn(*a, p=0.0, deterministic=False,
                           seed=jnp.zeros(2, jnp.int32)) ** 2).sum()

    def lx(*a):
        return (xla_ffn(*a, p=0.0, deterministic=False, seed=None) ** 2).sum()

    gp = jax.grad(lp, argnums=tuple(range(7)))(*args)
    gx = jax.grad(lx, argnums=tuple(range(7)))(*args)
    names = ["x", "gamma", "beta", "w1", "b1", "w2", "b2"]
    for a, b, n in zip(gp, gx, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_row_padding_is_inert():
    """R not divisible by the 256-row block: padded rows must not leak
    into outputs or gradients."""
    args = _inputs(R=130, seed=7)

    def loss(x, *rest):
        return (pallas_ffn(x, *rest, p=0.0, deterministic=True,
                           seed=None) ** 2).sum()

    g = jax.grad(loss)(*args)
    assert np.all(np.isfinite(np.asarray(g)))
    out = pallas_ffn(*args, p=0.1, deterministic=True, seed=None)
    ref = xla_ffn(*args, p=0.1, deterministic=True, seed=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_valid_skip_exact_on_live_rows():
    """Per-sample row-block skip (block_valid): live rows are bit-equal to
    the full computation fwd+bwd; dead blocks pass the residual through
    (their cotangents are zero in the model — attention never reads padded
    keys)."""
    rng = np.random.default_rng(3)
    B, L, C, F = 4, 512, 64, 256
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, .1, C), jnp.float32)
    beta = jnp.asarray(rng.normal(0, .1, C), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, .05, (C, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, .05, F), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, .05, (F, C)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, .05, C), jnp.float32)
    lens = np.array([100, 512, 300, 10])
    alive = np.arange(L)[None] < lens[:, None]
    bv = jnp.asarray(alive.reshape(B, L // 256, 256).any(-1), jnp.int32)
    amask = jnp.asarray(alive[:, :, None], jnp.float32)

    def run(bvv):
        def f(x, gamma, beta, w1, b1, w2, b2):
            o = pallas_ffn(x, gamma, beta, w1, b1, w2, b2, p=0.1,
                           deterministic=True, seed=None, block_valid=bvv)
            om = o * amask          # zero the dead-row cotangents
            return jnp.sum(om * jnp.cos(om)), o
        g, o = jax.grad(f, argnums=tuple(range(7)), has_aux=True)(
            x, gamma, beta, w1, b1, w2, b2)
        return g, o

    g_s, o_s = run(bv)
    g_f, o_f = run(None)
    np.testing.assert_array_equal(np.asarray(o_s) * np.asarray(amask),
                                  np.asarray(o_f) * np.asarray(amask))
    for a, b in zip(g_s, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # fully-dead block (sample 3, rows 256:512) passes the residual through
    np.testing.assert_array_equal(np.asarray(o_s)[3, 256:],
                                  np.asarray(x)[3, 256:])
