"""Row-block-skipped affine (kernels/rowmm.py) vs the plain XLA affine,
and the fused-QKV MultiHeadAttention path vs the plain projection path
(same params, same logits on live rows)."""
import jax
import jax.numpy as jnp
import numpy as np

from medical_tri_modal_pilot_tpu.kernels.rowmm import (
    pallas_rowskip_affine, pallas_rowskip_ln_affine, xla_rowskip_affine,
    xla_rowskip_ln_affine)


def _inputs(B=2, L=512, Cin=64, Cout=192, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, Cin)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (Cin, Cout)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.01, Cout), jnp.float32)
    return x, w, b


def test_all_valid_matches_xla():
    x, w, b = _inputs()
    out = pallas_rowskip_affine(x, w, b, None)
    ref = xla_rowskip_affine(x, w, b, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ragged_rows_padding_inert():
    """Row count not divisible by the 256-row block: outputs and grads
    finite and matching."""
    x, w, b = _inputs(B=1, L=130)

    def lp(x, w, b):
        return (pallas_rowskip_affine(x, w, b, None) ** 2).sum()

    def lx(x, w, b):
        return (xla_rowskip_affine(x, w, b, None) ** 2).sum()

    gp = jax.grad(lp, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lx, argnums=(0, 1, 2))(x, w, b)
    for a, r, n in zip(gp, gx, "x w b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_block_skip_exact_on_live_rows():
    """Dead 256-row blocks emit zeros fwd / contribute nothing bwd; live
    rows are bit-equal to the full computation (zero cotangents on dead
    rows, as the attention mask guarantees in the model)."""
    x, w, b = _inputs(B=4, L=512)
    lens = np.array([100, 512, 300, 10])
    alive = np.arange(512)[None] < lens[:, None]
    bv = jnp.asarray(alive.reshape(4, 2, 256).any(-1), jnp.int32)
    amask = jnp.asarray(alive[:, :, None], jnp.float32)

    def run(bvv):
        def f(x, w, b):
            o = pallas_rowskip_affine(x, w, b, bvv)
            om = o * amask          # zero the dead-row cotangents
            return jnp.sum(om * jnp.cos(om)), o
        g, o = jax.grad(f, argnums=(0, 1, 2), has_aux=True)(x, w, b)
        return g, o

    g_s, o_s = run(bv)
    g_f, o_f = run(None)
    np.testing.assert_array_equal(np.asarray(o_s) * np.asarray(amask),
                                  np.asarray(o_f) * np.asarray(amask))
    for a, r in zip(g_s, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)
    # fully-dead block (sample 3, rows 256:512) emits zeros
    np.testing.assert_array_equal(np.asarray(o_s)[3, 256:], 0.0)


def test_ln_fused_matches_xla():
    """LN-fused variant vs XLA StdLN + affine: fwd (all three outputs) and
    all grads, with a skipped dead block (zero cotangents on dead rows)."""
    x, w, b = _inputs(B=2, L=512)
    gamma = jnp.asarray(np.random.default_rng(2).normal(1, 0.1, 64),
                        jnp.float32)
    beta = jnp.asarray(np.random.default_rng(3).normal(0, 0.1, 64),
                       jnp.float32)
    lens = np.array([200, 512])
    alive = np.arange(512)[None] < lens[:, None]
    bv = jnp.asarray(alive.reshape(2, 2, 256).any(-1), jnp.int32)
    amask = jnp.asarray(alive[:, :, None], jnp.float32)

    def run(fn, bvv):
        def f(x, gamma, beta, w, b):
            q, k, v = fn(x, gamma, beta, w, b, bvv)
            o = jnp.concatenate([q, k, v], axis=-1) * amask
            return jnp.sum(o * jnp.cos(o)), o
        g, o = jax.grad(f, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            x, gamma, beta, w, b)
        return g, o

    g_p, o_p = run(pallas_rowskip_ln_affine, bv)
    g_x, o_x = run(xla_rowskip_ln_affine, None)
    np.testing.assert_allclose(np.asarray(o_p) * np.asarray(amask),
                               np.asarray(o_x) * np.asarray(amask),
                               rtol=2e-5, atol=2e-5)
    for a, r, n in zip(g_p, g_x, "x gamma beta w b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=n)
    # dead block emits zeros
    np.testing.assert_array_equal(np.asarray(o_p)[0, 256:], 0.0)


def test_encoder_layer_prenorm_fused_matches_plain():
    """TransformerEncoderLayer with the LN-fused QKV dispatch active vs
    inactive: identical param tree, matching outputs on live rows."""
    from medical_tri_modal_pilot_tpu.models import modules as M

    B, L, D = 2, 512, 64
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    lens = jnp.asarray([300, 120])
    key_mask = M.length_key_mask(lens, L)
    layer = M.TransformerEncoderLayer(d_model=D, num_heads=4, d_ff=128)
    params = layer.init(jax.random.PRNGKey(0), x, key_mask, True)

    old = M._QKV_LN_IMPL
    try:
        M.set_qkv_ln_impl(None)
        ref = layer.apply(params, x, key_mask, True)
        M.set_qkv_ln_impl(pallas_rowskip_ln_affine)
        out = layer.apply(params, x, key_mask, True)
    finally:
        M.set_qkv_ln_impl(old)

    live = np.arange(L)[None] < np.asarray(lens)[:, None]
    np.testing.assert_allclose(np.asarray(out)[live], np.asarray(ref)[live],
                               rtol=2e-5, atol=2e-5)


def test_mha_fused_qkv_matches_plain():
    """MultiHeadAttention with the fused-QKV dispatch active vs inactive:
    identical param tree, matching outputs on a padded self-attention
    stream."""
    from medical_tri_modal_pilot_tpu.models import modules as M

    B, L, D, H = 2, 512, 64, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    lens = jnp.asarray([300, 120])
    key_mask = M.length_key_mask(lens, L)
    mha = M.MultiHeadAttention(dim=D, num_heads=H)
    params = mha.init(jax.random.PRNGKey(0), x, x, x, key_mask)

    old = M._QKV_IMPL
    try:
        M.set_qkv_impl(None)
        ref = mha.apply(params, x, x, x, key_mask)
        M.set_qkv_impl(pallas_rowskip_affine)
        out = mha.apply(params, x, x, x, key_mask)
    finally:
        M.set_qkv_impl(old)

    live = np.arange(L)[None] < np.asarray(lens)[:, None]
    np.testing.assert_allclose(np.asarray(out)[live], np.asarray(ref)[live],
                               rtol=2e-5, atol=2e-5)
