"""MBT fusion semantics: static one-hot mixing == the reference's dynamic
gather; missing-text zeroing; vsltonly early exit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.models.mbt import (MBTFusion,
                                                    missing_candidate_weights)


def test_candidate_weights_match_reference_means():
    """The (4,3) weight matrix reproduces mbt_encoder.py:764-776:
    [tri_mean, vslt+img mean, vslt+txt mean, vslt-only]."""
    rng = np.random.default_rng(0)
    stack = rng.normal(size=(3, 5, 4, 8))   # [M, B, n, D]
    W = missing_candidate_weights(3)
    mixed = np.einsum("km,mbnd->kbnd", W, stack)
    np.testing.assert_allclose(mixed[0], stack.mean(0), atol=1e-12)
    np.testing.assert_allclose(mixed[1], (stack[0] + stack[1]) / 2, atol=1e-12)
    np.testing.assert_allclose(mixed[2], (stack[0] + stack[2]) / 2, atol=1e-12)
    np.testing.assert_allclose(mixed[3], stack[0], atol=1e-12)


def test_onehot_select_equals_gather():
    rng = np.random.default_rng(1)
    stack = rng.normal(size=(3, 6, 4, 8)).astype(np.float32)
    missing_num = np.array([0, 1, 2, 3, 1, 0])
    W = missing_candidate_weights(3)
    cands = np.einsum("km,mbnd->kbnd", W, stack)
    gathered = cands[missing_num, np.arange(6)]          # reference gather
    onehot = jax.nn.one_hot(jnp.asarray(missing_num), 4)
    # JAX matmul defaults truncate f32 to bf16 on TPU-class backends — the
    # model uses Precision.HIGHEST for the mixing (mbt.py); mirror it here.
    mix = np.asarray(jnp.einsum("bk,km->bm", onehot, W,
                                precision=jax.lax.Precision.HIGHEST))
    ours = np.einsum("bm,mbnd->bnd", mix, stack)
    np.testing.assert_allclose(ours, gathered, atol=1e-6)


@pytest.fixture(scope="module")
def fusion_setup():
    B, Lv, Li, Lt, D = 4, 12, 5, 9, 32
    rng = jax.random.PRNGKey(0)
    inputs = [jax.random.normal(jax.random.PRNGKey(i), (B, L, D))
              for i, L in enumerate((Lv, Li, Lt))]
    varying = [jnp.array([12, 3, 7, 12]), jnp.full((B,), Li),
               jnp.array([2, 2, 5, 9])]   # txt lengths already +2
    fusion = MBTFusion(n_modality=3, bottlenecks_n=2, n_layers=2, n_head=4,
                       d_model=D, d_ff=64, dropout=0.0)
    missing_num = jnp.array([0, 1, 2, 3])
    params = fusion.init(jax.random.PRNGKey(9), inputs, varying, missing_num)
    return fusion, params, inputs, varying, missing_num


def test_fusion_shapes(fusion_setup):
    fusion, params, inputs, varying, missing_num = fusion_setup
    outs = fusion.apply(params, inputs, varying, missing_num)
    assert [o.shape for o in outs] == [(4, 13, 32), (4, 6, 32), (4, 10, 32)]
    for o in outs:
        assert bool(jnp.all(jnp.isfinite(o)))


def test_missing_txt_does_not_leak_into_vslt(fusion_setup):
    """For a sample with missing_num=3 (vslt-only), perturbing its text
    tokens must not change its vslt output (bottleneck select drops txt and
    the txt stack is masked)."""
    fusion, params, inputs, varying, missing_num = fusion_setup
    # use a batch where every sample is vslt-only; txt length 2 -> masked
    mn = jnp.full((4,), 3)
    varying2 = [varying[0], varying[1], jnp.full((4,), 2)]
    out1 = fusion.apply(params, inputs, varying2, mn)[0]
    txt2 = inputs[2] + 100.0
    out2 = fusion.apply(params, [inputs[0], inputs[1], txt2], varying2, mn)[0]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_image_leaks_by_design_when_unmasked(fusion_setup):
    """The single-image stack runs unmasked (mask=[True,False,True],
    tri_mbt_vsltcls.py:144) — zero images still influence the tri-mean
    bottlenecks. Quirk preserved: with missing_num=0 image perturbations
    must change vslt outputs."""
    fusion, params, inputs, varying, missing_num = fusion_setup
    mn = jnp.zeros((4,), jnp.int32)
    out1 = fusion.apply(params, inputs, varying, mn)[0]
    # additive perturbation: the input LayerNorm is scale-invariant, so a
    # multiplicative change would be a no-op by construction
    img2 = inputs[1] + jax.random.normal(jax.random.PRNGKey(42),
                                         inputs[1].shape)
    out2 = fusion.apply(params, [inputs[0], img2, inputs[2]], varying, mn)[0]
    assert float(jnp.abs(out1 - out2).max()) > 1e-6


def test_long_stream_prepad_is_mask_correct():
    """MBTFusion pre-pads long streams to the flash kernel tile (mbt.py);
    cls outputs must be invariant to junk rows beyond the varying lengths
    (both shapes round to the same padded total)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from medical_tri_modal_pilot_tpu.models.mbt import MBTFusion

    rng = np.random.default_rng(0)
    B, D = 2, 32
    fusion = MBTFusion(n_modality=3, bottlenecks_n=4, d_model=D, n_head=2,
                       d_ff=64, n_layers=2, dropout=0.0)
    vlen = jnp.asarray([530, 601], jnp.int32)
    base = rng.normal(size=(B, 700, D)).astype(np.float32)
    img = rng.normal(size=(B, 7, D)).astype(np.float32)
    txt = rng.normal(size=(B, 9, D)).astype(np.float32)
    lens = [vlen, jnp.asarray([7, 7]), jnp.asarray([9, 5])]
    mnum = jnp.asarray([0, 1], jnp.int32)

    def run(tokens):
        params = fusion.init(jax.random.PRNGKey(0),
                             [jnp.asarray(tokens), jnp.asarray(img),
                              jnp.asarray(txt)], lens, mnum, True)
        outs = fusion.apply(params, [jnp.asarray(tokens), jnp.asarray(img),
                                     jnp.asarray(txt)], lens, mnum, True)
        return [np.asarray(o[:, 0]) for o in outs]

    a = run(base[:, :620])          # 620+1+4 = 625 -> padded to 768
    scrambled = base.copy()
    scrambled[:, 610:] = 99.0       # junk beyond every length
    b = run(scrambled[:, :700])     # 700+1+4 = 705 -> padded to 768
    for u, w in zip(a, b):
        np.testing.assert_allclose(u, w, atol=2e-5, rtol=2e-5)
