"""Distinguishing tests for the de-aliased model variants: tri_mbt_v1/v2/v3
and tri_mbt_vflexible/2/3 are wiring variants, not aliases (reference
tri_mbt_v2.py / tri_mbt_v3.py / tri_mbt_vflexible{2,3}.py diffs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.models import get_model


def _cfg(model, **over):
    argv = [
        "--model", model, "--input-types", "vslt_img_txt",
        "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--batch-size", "2", "--TIE-len", "16",
        "--transformer-num-layers", "1", "--transformer-dim", "32",
        "--transformer-num-head", "2", "--img-model-type", "resnet18",
        "--precision", "fp32", "--use-pallas", "0",
    ]
    for k, v in over.items():
        argv += [k, v]
    return parse_config(argv)


def _batch(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    tie = np.zeros((B, cfg.tie_len, 3), np.float32)
    lengths = rng.integers(4, cfg.tie_len, B).astype(np.int32)
    for i, L in enumerate(lengths):
        tie[i, :L, 0] = np.sort(rng.uniform(-24, 0, L))
        tie[i, :L, 1] = rng.uniform(0, 1, L)
        tie[i, :L, 2] = rng.integers(0, 18, L)
    return {
        "vslt": tie,
        "static": rng.uniform(0, 1, (B, 2)).astype(np.float32),
        "target": rng.integers(0, 2, B).astype(np.float32),
        "input_length": lengths,
        "img": rng.uniform(0, 1, (B, 1, cfg.image_size, cfg.image_size)).astype(np.float32),
        "img_time": rng.uniform(-24, 0, B).astype(np.float32),
        "txt": rng.normal(0, 1, (B, 128, 768)).astype(np.float32),
        "txt_length": rng.integers(1, 128, B).astype(np.int32),
        "txt_time": rng.uniform(-24, 0, B).astype(np.float32),
        "missing": np.zeros((B, 3), np.float32),
        "target_aux": np.zeros(B, np.float32),
    }


def _init_and_apply(cfg, batch, missing_num):
    model = get_model(cfg)
    rng = jax.random.PRNGKey(0)
    jb = jax.tree.map(jnp.asarray, batch)
    variables = model.init({"params": rng, "dropout": rng}, jb,
                           missing_num, True)
    out = model.apply(variables, jb, missing_num, True)
    return model, variables, out


def _param_paths(variables):
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    return {jax.tree_util.keystr(kp) for kp, _ in flat}


def test_flexible_temperatures_differ():
    """flexible2/3 scale the masked weights by 10 / 3.334 before the
    softmax (vflexible2.py:279, vflexible3.py:279) — with identical params
    and a nonzero flexibleavg, outputs must differ across variants."""
    cfg1 = _cfg("tri_mbt_vflexible")
    batch = _batch(cfg1)
    missing_num = jnp.zeros(2, jnp.int32)
    model1, variables, _ = _init_and_apply(cfg1, batch, missing_num)

    # zero-initialized flexibleavg is temperature-invariant; perturb it
    params = jax.tree.map(lambda x: x, variables["params"])
    import flax.core
    params = flax.core.unfreeze(params)
    params["flexibleavg"] = jnp.asarray([[0.5], [-0.3], [0.8]])
    variables = dict(variables)
    variables["params"] = params

    jb = jax.tree.map(jnp.asarray, batch)
    outs = {}
    for name in ("tri_mbt_vflexible", "tri_mbt_vflexible2", "tri_mbt_vflexible3"):
        model = get_model(_cfg(name))
        logits, _, _ = model.apply(variables, jb, missing_num, True)
        outs[name] = np.asarray(logits)
    assert not np.allclose(outs["tri_mbt_vflexible"], outs["tri_mbt_vflexible2"])
    assert not np.allclose(outs["tri_mbt_vflexible"], outs["tri_mbt_vflexible3"])
    assert not np.allclose(outs["tri_mbt_vflexible2"], outs["tri_mbt_vflexible3"])


def test_flexible_temp_formula():
    """cls_weight = softmax(fill(w, -1e9) * temp) — fill BEFORE scale, as
    in the reference source order."""
    w = np.array([[0.5], [-0.3], [0.8]], np.float32)
    mask = np.array([False, True, False])  # missing case 2: img masked
    wf = np.where(mask[:, None], -1e9, w) * 10.0
    expect = np.exp(wf - wf.max(0)) / np.exp(wf - wf.max(0)).sum(0)
    got = np.asarray(jax.nn.softmax(jnp.asarray(wf), axis=0))
    np.testing.assert_allclose(got, expect, atol=1e-6)
    assert got[1, 0] == 0.0  # masked modality weight fully suppressed


def test_v1_v2_v3_param_trees_differ():
    missing_num = jnp.zeros(2, jnp.int32)
    cfg1, cfg2, cfg3 = _cfg("tri_mbt_v1"), _cfg("tri_mbt_v2"), _cfg("tri_mbt_v3")
    batch = _batch(cfg1)
    _, v1, o1 = _init_and_apply(cfg1, batch, missing_num)
    _, v2, o2 = _init_and_apply(cfg2, batch, missing_num)
    _, v3, o3 = _init_and_apply(cfg3, batch, missing_num)
    p1, p2 = _param_paths(v1), _param_paths(v2)
    # v1: LayerNorm head (fc_list/ln); v2: BatchNorm head (fc_list/bn)
    assert any("fc_list" in p and "ln" in p for p in p1), sorted(p1)[:5]
    assert any("fc_list" in p and "bn" in p for p in p2), sorted(p2)[:5]
    assert o1[0].shape == o2[0].shape == (2,)
    assert o3[0].shape == (2,)


def test_v3_forces_patch_embed_stem():
    """v3 uses the MONAI patch embed regardless of --img-model-type
    (tri_mbt_v3.py:86-96)."""
    cfg3 = _cfg("tri_mbt_v3", **{"--img-model-type": "vit"})
    batch = _batch(cfg3)
    _, v3, _ = _init_and_apply(cfg3, batch, jnp.zeros(2, jnp.int32))
    paths = _param_paths(v3)
    assert any("patch_embedding" in p for p in paths)
    assert not any("img_encoder" in p for p in paths)


def test_v2_rmse_mixing_present_v1_absent():
    over = {"--auxiliary-loss-type": "rmse"}
    missing_num = jnp.zeros(2, jnp.int32)
    cfg1, cfg2 = _cfg("tri_mbt_v1", **over), _cfg("tri_mbt_v2", **over)
    batch = _batch(cfg1)
    _, _, o1 = _init_and_apply(cfg1, batch, missing_num)
    _, _, o2 = _init_and_apply(cfg2, batch, missing_num)
    assert o1[1] is None      # v1 forward returns output2=None (ref :282)
    assert o2[1] is not None and o2[1].shape == (2,)


def test_flagship_carryforward_forward():
    """carryforward flagship: vslt_enc consumes the DATA channel of the
    [B, 3, T, F] stack (reference trainer.py:40-44 passes train_x[0];
    regression for the r3 4-D concat crash)."""
    cfg = _cfg("tri_mbt_vsltcls", **{"--vslt-type": "carryforward"})
    B = 2
    batch = _batch(cfg, B)
    rng = np.random.default_rng(3)
    batch["vslt"] = rng.uniform(
        0, 1, (B, 3, cfg.window_size, cfg.vslt_len)).astype(np.float32)
    batch["input_length"] = np.array([cfg.window_size] * B, np.int32)
    logits, rmse, aux = _init_and_apply(
        cfg, batch, jnp.zeros(B, jnp.int32))[2]
    assert logits.shape == (B,)
    assert np.all(np.isfinite(np.asarray(logits)))
