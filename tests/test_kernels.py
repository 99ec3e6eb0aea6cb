"""Pallas flash-attention kernel numerics vs the XLA reference path
(interpret mode on CPU; the same code runs compiled on TPU). Covers the
shape-adaptive block sizes, fully-masked rows (uniform-average semantics),
array padding, and the custom VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.kernels.attention import (
    pallas_masked_attention, _block_sizes)
from medical_tri_modal_pilot_tpu.models.modules import (
    masked_softmax_attention)


def _mk(B, H, L, D, seed=0):
    # attention operands are [B, L, H, D] (head axis in place — see
    # modules.masked_softmax_attention)
    k = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(k, 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.float32)
    kx = jax.random.normal(kk, (B, L, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, L, H, D), jnp.float32)
    return q, kx, v


# shapes hitting different block regimes: single-block short streams
# (img 54, txt 130) and the multi-q-block TIE stream (1005)
SHAPES = [(3, 2, 54, 32), (2, 4, 130, 64), (2, 2, 517, 64)]


@pytest.mark.parametrize("B,H,L,D", SHAPES)
def test_forward_matches_xla(B, H, L, D):
    q, k, v = _mk(B, H, L, D)
    lengths = np.linspace(1, L, B).astype(np.int32)
    key_mask = jnp.arange(L)[None, :] >= jnp.asarray(lengths)[:, None]
    ref = masked_softmax_attention(q, k, v, key_mask, 8.0)
    out = pallas_masked_attention(q, k, v, key_mask, 8.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fully_masked_rows_uniform():
    """length 0 => every key at MASK_FILL_VALUE => uniform average of V
    (the reference's txt==3 zeroing relies on this)."""
    B, H, L, D = 2, 2, 64, 32
    q, k, v = _mk(B, H, L, D, seed=1)
    key_mask = jnp.ones((B, L), bool)     # everything masked
    out = pallas_masked_attention(q, k, v, key_mask, 8.0)
    expect = jnp.mean(v, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(expect), out.shape),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_xla():
    B, H, L, D = 2, 2, 130, 32
    q, k, v = _mk(B, H, L, D, seed=2)
    lengths = np.array([130, 40], np.int32)
    key_mask = jnp.arange(L)[None, :] >= jnp.asarray(lengths)[:, None]

    def loss_ref(q, k, v):
        return (masked_softmax_attention(q, k, v, key_mask, 8.0) ** 2).sum()

    def loss_ours(q, k, v):
        return (pallas_masked_attention(q, k, v, key_mask, 8.0) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_noncontiguous_2d_mask_matches_xla():
    """Early-fusion / MTFusion concatenate per-modality masks, so padding
    sits mid-sequence — the kernel must NOT assume tail-contiguity
    (round-1 advisor high: max abs diff 0.46 on these masks)."""
    B, H, L, D = 3, 2, 130, 32
    q, k, v = _mk(B, H, L, D, seed=4)
    rng = np.random.default_rng(7)
    key_mask = jnp.asarray(rng.integers(0, 2, (B, L)).astype(bool))
    ref = masked_softmax_attention(q, k, v, key_mask, 8.0)
    out = pallas_masked_attention(q, k, v, key_mask, 8.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_noncontiguous_2d_mask_grads():
    B, H, L, D = 2, 2, 130, 32
    q, k, v = _mk(B, H, L, D, seed=5)
    rng = np.random.default_rng(9)
    key_mask = jnp.asarray(rng.integers(0, 2, (B, L)).astype(bool))

    g_ref = jax.grad(lambda *a: (masked_softmax_attention(*a, key_mask, 8.0) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_ours = jax.grad(lambda *a: (pallas_masked_attention(*a, key_mask, 8.0) ** 2).sum(),
                      argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


@pytest.mark.parametrize("B,H,L,D", [(2, 2, 54, 32), (2, 2, 300, 64)])
def test_3d_block_mask_matches_xla(B, H, L, D):
    """Full [B, Lq, Lk] block masks (multitoken MBT variants) now run the
    fused kernel instead of falling back to the score-materializing path."""
    q, k, v = _mk(B, H, L, D, seed=6)
    rng = np.random.default_rng(11)
    mask = rng.integers(0, 2, (B, L, L)).astype(bool)
    mask[:, :, 0] = False  # keep at least one live key per row
    mask = jnp.asarray(mask)
    ref = masked_softmax_attention(q, k, v, mask, 8.0)
    out = pallas_masked_attention(q, k, v, mask, 8.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_3d_block_mask_grads():
    B, H, L, D = 2, 2, 130, 32
    q, k, v = _mk(B, H, L, D, seed=7)
    rng = np.random.default_rng(13)
    mask = rng.integers(0, 2, (B, L, L)).astype(bool)
    mask[:, :, 0] = False
    mask = jnp.asarray(mask)

    g_ref = jax.grad(lambda *a: (masked_softmax_attention(*a, mask, 8.0) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_ours = jax.grad(lambda *a: (pallas_masked_attention(*a, mask, 8.0) ** 2).sum(),
                      argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_no_mask_matches_xla():
    B, H, L, D = 2, 2, 54, 32
    q, k, v = _mk(B, H, L, D, seed=8)
    ref = masked_softmax_attention(q, k, v, None, 8.0)
    out = pallas_masked_attention(q, k, v, None, 8.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_sizes_adaptive():
    # block_k doubles as the per-sample dynamic skip granularity: 512 on
    # long streams (TIE-1000 -> 2 skippable blocks; measured fastest), one
    # block when short
    assert _block_sizes(1005, 1005) == (256, 512)
    assert _block_sizes(54, 54) == (128, 128)
    assert _block_sizes(130, 130) == (256, 256)


def test_dynamic_kblock_skip_exact():
    """Long stream + very short per-sample lengths exercises the scalar-
    prefetched k-block bound (most blocks skipped); an all-masked sample
    rides along to hit the full-count fallback. Forward AND grads must
    equal the XLA path exactly (skipping is only applied where masked
    contributions underflow to zero)."""
    B, H, L, D = 4, 2, 1005, 64
    q, k, v = _mk(B, H, L, D, seed=11)
    lengths = np.array([3, 140, 900, 0], np.int32)   # 0 = all masked
    key_mask = jnp.arange(L)[None, :] >= jnp.asarray(lengths)[:, None]
    ref = masked_softmax_attention(q, k, v, key_mask, 8.0)
    out = pallas_masked_attention(q, k, v, key_mask, 8.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def lp(q, k, v):
        o = pallas_masked_attention(q, k, v, key_mask, 8.0)
        return (o.astype(jnp.float32) ** 2).sum()

    def lx(q, k, v):
        o = masked_softmax_attention(q, k, v, key_mask, 8.0)
        return (o.astype(jnp.float32) ** 2).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_self_attention_qblock_skip():
    """is_self=True (MultiHeadAttention self-attention) skips q blocks past
    each sample's last valid key: live rows match XLA exactly, dead rows
    are emitted as zeros, and gradients through a live-row objective match
    (dead rows carry structurally-zero cotangents in the models)."""
    B, H, L, D = 3, 2, 1005, 64
    q, k, v = _mk(B, H, L, D, seed=12)
    lengths = np.array([200, 700, 1005], np.int32)
    key_mask = jnp.arange(L)[None, :] >= jnp.asarray(lengths)[:, None]

    ref = masked_softmax_attention(q, k, v, key_mask, 8.0)
    out = pallas_masked_attention(q, k, v, key_mask, 8.0, is_self=True)
    live = ~np.asarray(key_mask)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b][live[b]],
                                   np.asarray(ref)[b][live[b]],
                                   rtol=2e-5, atol=2e-5)
    # rows in fully-dead q blocks are zero (256-aligned block granularity)
    blk = 256
    for b in range(B):
        dead_from = ((lengths[b] + blk - 1) // blk) * blk
        if dead_from < L:
            assert np.abs(np.asarray(out)[b][dead_from:]).max() == 0.0

    w = jnp.asarray(live[:, :, None, None].astype(np.float32))

    def lp(q, k, v):
        o = pallas_masked_attention(q, k, v, key_mask, 8.0, is_self=True)
        return ((o * w).astype(jnp.float32) ** 2).sum()

    def lx(q, k, v):
        o = masked_softmax_attention(q, k, v, key_mask, 8.0)
        return ((o * w).astype(jnp.float32) ** 2).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_self_attention_all_masked_keeps_uniform():
    """All-masked samples must keep full q coverage under is_self (the
    reference's uniform-average semantics are read at the cls row)."""
    B, H, L, D = 2, 2, 300, 32
    q, k, v = _mk(B, H, L, D, seed=13)
    key_mask = jnp.ones((B, L), bool)
    out = pallas_masked_attention(q, k, v, key_mask, 8.0, is_self=True)
    expect = jnp.mean(v, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.asarray(expect), out.shape),
                               rtol=2e-5, atol=2e-5)
