"""Fused attention-block kernel (kernels/attn_block.py) vs the unfused
XLA composition — forward and custom-VJP parity in interpret mode on CPU
(the same code runs compiled on TPU; tools/verify_kernels_tpu.py re-checks
there). The oracle is exactly what the composed path computes: StdLN ->
q/k/v projections -> masked softmax attention -> +residual."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.kernels.attn_block import (
    pallas_attn_block, xla_attn_block)


def _mk(B, L, C, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (B, L, C), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    w = jax.random.normal(ks[3], (C, 3 * C), jnp.float32) / np.sqrt(C)
    b = 0.1 * jax.random.normal(ks[4], (3 * C,), jnp.float32)
    return x, gamma, beta, w, b


# single-block short streams (img/txt geometry) and a multi-q-block
# TIE-like stream; H*D == C throughout
SHAPES = [(3, 54, 64, 2), (2, 130, 64, 4), (2, 517, 64, 2)]


def _lengths_mask(B, L):
    lengths = np.linspace(1, L, B).astype(np.int32)
    return lengths, jnp.arange(L)[None, :] >= jnp.asarray(lengths)[:, None]


def _live_rows(lengths, L):
    """Rows inside live q blocks. Rows past a sample's last valid key in
    a fully-dead q block emit the pure residual instead of the composed
    path's unused attention values (same documented deviation as
    kernels/attention.py is_self q-skip) — downstream reads none of them,
    so parity is asserted on the live region only."""
    from medical_tri_modal_pilot_tpu.kernels.attention import _block_sizes
    bq, _ = _block_sizes(L, L)
    live = np.zeros((len(lengths), L), bool)
    for i, n in enumerate(lengths):
        live[i, :min(L, ((n - 1) // bq + 1) * bq)] = True
    return live


@pytest.mark.parametrize("B,L,C,H", SHAPES)
def test_forward_matches_composition(B, L, C, H):
    x, gamma, beta, w, b = _mk(B, L, C)
    lengths, mask = _lengths_mask(B, L)
    scale = np.sqrt(C // H)
    ref = np.asarray(xla_attn_block(x, gamma, beta, w, b, mask, scale, H))
    out = np.asarray(pallas_attn_block(x, gamma, beta, w, b, mask,
                                       scale, H))
    live = _live_rows(lengths, L)
    np.testing.assert_allclose(out[live], ref[live], rtol=2e-5, atol=2e-5)
    # dead rows: pure residual passthrough
    np.testing.assert_array_equal(out[~live], np.asarray(x)[~live])


def test_forward_no_mask():
    B, L, C, H = 2, 130, 64, 4
    x, gamma, beta, w, b = _mk(B, L, C, seed=1)
    scale = np.sqrt(C // H)
    ref = xla_attn_block(x, gamma, beta, w, b, None, scale, H)
    out = pallas_attn_block(x, gamma, beta, w, b, None, scale, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fully_masked_sample_uniform():
    """An all-masked sample (txt length==3 -> 0 trick) must fall back to
    uniform attention over every real key, plus the residual."""
    B, L, C, H = 2, 64, 64, 2
    x, gamma, beta, w, b = _mk(B, L, C, seed=2)
    mask = jnp.stack([jnp.ones((L,), bool),
                      jnp.arange(L) >= 20])
    scale = np.sqrt(C // H)
    ref = xla_attn_block(x, gamma, beta, w, b, mask, scale, H)
    out = pallas_attn_block(x, gamma, beta, w, b, mask, scale, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dead_rows_pass_residual():
    """q rows in fully-dead q blocks (past a sample's last valid key)
    emit the pure residual (the composed path adds x to an unused
    attention output; downstream reads neither — but the residual stream
    itself must survive for the fused-FFN passthrough)."""
    B, L, C, H = 1, 512, 64, 2
    x, gamma, beta, w, b = _mk(B, L, C, seed=3)
    mask = (jnp.arange(L) >= 40)[None, :]
    out = pallas_attn_block(x, gamma, beta, w, b, mask, np.sqrt(32), H)
    # block_q = 256 here: rows >= 256 are a dead q block -> pure residual
    np.testing.assert_array_equal(np.asarray(out[0, 256:]),
                                  np.asarray(x[0, 256:]))


@pytest.mark.parametrize("B,L,C,H", [(2, 130, 64, 4), (2, 517, 64, 2)])
def test_grads_match_composition(B, L, C, H):
    """Cotangents flow only into live rows (downstream semantics: dead
    rows are masked keys everywhere and the fused FFN passes them
    through), so the gradient comparison zeroes the cotangent on dead
    rows — exactly the cotangent pattern the real models produce."""
    x, gamma, beta, w, b = _mk(B, L, C, seed=4)
    lengths, mask = _lengths_mask(B, L)
    scale = np.sqrt(C // H)
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, L, C), jnp.float32)
    cot = cot * jnp.asarray(_live_rows(lengths, L))[:, :, None]

    def loss_p(x, gamma, beta, w, b):
        return jnp.sum(pallas_attn_block(x, gamma, beta, w, b, mask,
                                         scale, H) * cot)

    def loss_x(x, gamma, beta, w, b):
        return jnp.sum(xla_attn_block(x, gamma, beta, w, b, mask,
                                      scale, H) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    for a, e, name in zip(gp, gx, ["dx", "dgamma", "dbeta", "dw", "db"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def _block_mask_3d(B, L, groups=4):
    """vmulti-style group-diagonal block mask: token i may attend within
    its group plus the first group (bottleneck rows), mirroring the
    multitoken MBT geometry (mbt_encoder.py:381-423)."""
    g = np.minimum(np.arange(L) * groups // L, groups - 1)
    allow = (g[:, None] == g[None, :]) | (g[None, :] == 0)
    m = np.broadcast_to(~allow, (B, L, L))
    return jnp.asarray(m)


def test_forward_3d_block_mask():
    B, L, C, H = 2, 130, 64, 2
    x, gamma, beta, w, b = _mk(B, L, C, seed=7)
    mask = _block_mask_3d(B, L)
    scale = np.sqrt(C // H)
    ref = xla_attn_block(x, gamma, beta, w, b, mask, scale, H)
    out = pallas_attn_block(x, gamma, beta, w, b, mask, scale, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_3d_block_mask():
    B, L, C, H = 2, 130, 64, 2
    x, gamma, beta, w, b = _mk(B, L, C, seed=8)
    mask = _block_mask_3d(B, L)
    scale = np.sqrt(C // H)
    cot = jax.random.normal(jax.random.PRNGKey(13), (B, L, C), jnp.float32)

    def loss_p(x, gamma, beta, w, b):
        return jnp.sum(pallas_attn_block(x, gamma, beta, w, b, mask,
                                         scale, H) * cot)

    def loss_x(x, gamma, beta, w, b):
        return jnp.sum(xla_attn_block(x, gamma, beta, w, b, mask,
                                      scale, H) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    for a, e, name in zip(gp, gx, ["dx", "dgamma", "dbeta", "dw", "db"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("hole", [False, True])
def test_fused_bwd_matches_composed(hole):
    """The one-kernel backward vs the composed rowmm+flash+rowmm chain it
    replaced (`_bwd_composed`), including the documented flag-skip
    semantics on block-aligned masks: with L % 256 == 0, a 256-row block
    containing no unmasked key contributes nothing to any gradient and its
    dx is the bare residual cotangent."""
    from medical_tri_modal_pilot_tpu.kernels.attn_block import (
        _bwd_composed, _fused_block_bwd, _fused_block_fwd)
    B, L, C, H = 2, 768, 64, 2
    x, gamma, beta, w, b = _mk(B, L, C, seed=6)
    if hole:
        # block 1 (rows 256..511) fully masked -> flag-skipped
        mask = (jnp.arange(L) >= 256) & (jnp.arange(L) < 512)
        mask = jnp.broadcast_to(mask, (B, L))
    else:
        _, mask = _lengths_mask(B, L)
    m3 = mask[:, None, :].astype(jnp.int8)
    mult = 1.0 / np.sqrt(C // H)
    out, res = _fused_block_fwd(x, gamma, beta, w, b, m3, mult, H)
    cot = jax.random.normal(jax.random.PRNGKey(11), out.shape, out.dtype)
    gf = _fused_block_bwd(mult, H, res, cot)
    gc = _bwd_composed(mult, H, res, cot)
    for a, e, name in zip(gf, gc, ["dx", "dgamma", "dbeta", "dw", "db"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    if hole:
        # flag-skipped rows: dx is exactly the residual cotangent
        np.testing.assert_array_equal(np.asarray(gf[0][:, 256:512]),
                                      np.asarray(cot[:, 256:512]))


def test_bf16_forward():
    B, L, C, H = 2, 256, 64, 2
    x, gamma, beta, w, b = _mk(B, L, C, seed=5)
    _, mask = _lengths_mask(B, L)
    scale = np.sqrt(C // H)
    out = pallas_attn_block(x.astype(jnp.bfloat16), gamma, beta, w, b,
                            mask, scale, H)
    ref = xla_attn_block(x.astype(jnp.bfloat16), gamma, beta, w, b,
                         mask, scale, H)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)
