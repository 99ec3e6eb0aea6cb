"""Parity of the fused Pallas window-attention kernel vs the XLA formula
(kernels/swin_attention.py), and of the new explicit-weights WindowAttention
vs the fused path end-to-end. CPU interpret mode (conftest forces cpu)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.kernels.swin_attention import (
    pallas_window_attention, xla_window_attention)
from medical_tri_modal_pilot_tpu.models.swin import (
    SwinTransformer, _shift_attn_mask, set_window_attention_impl)


def _mk(I, N, C, nh, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((I, N, C)), jnp.float32),
            jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal(3 * C) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal((nh, N, N)) * 0.1, jnp.float32))


@pytest.mark.parametrize("C,nh,HW", [(96, 3, 56), (192, 6, 28),
                                     (384, 12, 14), (768, 24, 7)])
def test_kernel_matches_xla(C, nh, HW):
    N = 49
    M = (HW // 7) ** 2
    I = 2 * M          # two images' worth of windows
    xw, wqkv, bqkv, wproj, bproj, bias = _mk(I, N, C, nh)
    for smask in (None,
                  jnp.asarray(_shift_attn_mask(HW, HW, 7, 3))
                  if HW > 7 else None):
        a = xla_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                 smask, nh)
        b = pallas_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                    smask, nh)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_kernel_grads_match_xla():
    C, nh, HW, N = 96, 3, 56, 49
    M = (HW // 7) ** 2
    xw, wqkv, bqkv, wproj, bproj, bias = _mk(M, N, C, nh, seed=1)
    smask = jnp.asarray(_shift_attn_mask(HW, HW, 7, 3))

    def loss_pallas(xw, wqkv, bias):
        return pallas_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                       smask, nh).sum()

    def loss_xla(xw, wqkv, bias):
        return xla_window_attention(xw, wqkv, bqkv, wproj, bproj, bias,
                                    smask, nh).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(xw, wqkv, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(xw, wqkv, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_swin_forward_same_under_both_impls():
    """Full Swin-T forward: XLA impl vs fused kernel, same params.
    224 is the only input size whose maps stay even through all three
    patch merges (224/4 = 56 -> 28 -> 14 -> 7)."""
    m = SwinTransformer(in_channels=1)
    img = jnp.asarray(np.random.default_rng(2).random((1, 1, 224, 224)),
                      jnp.float32)
    params = m.init(jax.random.PRNGKey(0), img)
    try:
        set_window_attention_impl(pallas_window_attention)
        a = m.apply(params, img)
    finally:
        set_window_attention_impl(xla_window_attention)
    b = m.apply(params, img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-5, rtol=1e-4)


def test_stochastic_depth_training_path():
    """Unfrozen-trunk training: nonzero drop rate changes the forward
    between rng draws and vanishes at eval (torchvision swin_t trains with
    stochastic_depth_prob=0.2, swin_transformer.py:835-841)."""
    m = SwinTransformer(in_channels=1, depths=(2,), num_heads=(3,),
                        stochastic_depth_prob=0.5)
    img = jnp.asarray(np.random.default_rng(3).random((4, 1, 28, 28)),
                      jnp.float32)
    params = m.init(jax.random.PRNGKey(0), img)
    ev = m.apply(params, img, True)
    tr1 = m.apply(params, img, False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    tr2 = m.apply(params, img, False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(ev))
    # block 0 has sd_prob 0 (linear ramp) — eval equals itself trivially;
    # deterministic path must be unchanged by the field
    np.testing.assert_allclose(
        np.asarray(ev),
        np.asarray(m.apply(params, img, True)), rtol=0, atol=0)


def test_frozen_trunk_train_step_ignores_stochastic_depth():
    """The flagship freezes the swin trunk (reference .eval() +
    torch.no_grad): training flow must produce identical image features
    regardless of the dropout rng."""
    import sys
    sys.path.insert(0, "/root/repo")
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.models.models import ImageEncoder

    cfg = parse_config([
        "--input-types", "vslt_img_txt", "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", "tri_mbt_vsltcls", "--batch-size", "2",
        "--img-model-type", "swin", "--img-pretrain", "Yes",
        "--image-size", "224",
    ])
    enc = ImageEncoder(cfg)
    img = jnp.asarray(np.random.default_rng(5).random((1, 1, 224, 224)),
                      jnp.float32)
    params = enc.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, img, False)
    a = enc.apply(params, img, False, rngs={"dropout": jax.random.PRNGKey(2)})
    b = enc.apply(params, img, False, rngs={"dropout": jax.random.PRNGKey(3)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
