"""Legacy family smoke tests: every registered legacy archetype
initializes, jits, and produces finite per-sample logits on the
carryforward layout the family was built for (reference
builder/models/{1,2,4,5,6}_*)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.models import available_models, get_model
from medical_tri_modal_pilot_tpu.train.trainer import compute_missing_num

T = 24


def _cfg(model: str, input_types: str):
    return parse_config([
        "--input-types", input_types,
        "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", model,
        "--vslt-type", "carryforward",
        "--batch-size", "2",
        "--transformer-num-layers", "2",
        "--transformer-dim", "64",
        "--transformer-num-head", "2",
        "--img-model-type", "resnet18",
        "--precision", "fp32",
    ])


def _batch(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(3, T, B).astype(np.int32)
    vslt = rng.uniform(0, 1, (B, 3, T, cfg.vslt_len)).astype(np.float32)
    missing = np.zeros((B, 3), np.float32)
    missing[:, 1] = rng.integers(0, 2, B)
    missing[:, 2] = rng.integers(0, 2, B)
    return {
        "vslt": vslt,
        "static": rng.uniform(0, 1, (B, 2)).astype(np.float32),
        "target": rng.integers(0, 2, B).astype(np.float32),
        "input_length": lengths,
        "img": rng.uniform(0, 1, (B, 1, cfg.image_size,
                                  cfg.image_size)).astype(np.float32),
        "img_time": rng.uniform(-24, 0, B).astype(np.float32),
        "txt": rng.normal(0, 1, (B, 128, 768)).astype(np.float32),
        "txt_length": rng.integers(3, 128, B).astype(np.int32),
        "txt_time": rng.uniform(-24, 0, B).astype(np.float32),
        "missing": missing,
        "f_indices": np.zeros((B, 36), np.float32),
        "target_aux": np.zeros(B, np.float32),
    }


def _run(model_name, input_types):
    cfg = _cfg(model_name, input_types)
    model = get_model(cfg)
    batch = jax.tree.map(jnp.asarray, _batch(cfg))
    missing_num = compute_missing_num(cfg, batch["missing"])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch,
                           missing_num, True)
    logits, rmse, aux = model.apply(variables, batch, missing_num, True)
    return np.asarray(logits), aux


UNI_VSLT = ["binary_t_transformer", "multi_f_transformer",
            "multi_ft_transformer", "binary_gru_d_t_transformer"]
UNI_IMAGE = ["resnet", "swin_transformer", "vit_monai"]
BI_IMG = ["earlyfusion_img_vslt", "latefusion_img_trans_vslt_grud",
          "midfusion_img_trans_vslt_ttrans",
          "cross_transformer_img_vslt_sssccc"]
BI_TXT = ["earlyfusion_vslt_txt_transformer",
          "latefusion_vslt_grud_txt_transformer",
          "midfusion_vslt_txt_transformer", "cross_transformer_txt_vslt"]


@pytest.mark.parametrize("name", UNI_VSLT)
def test_uni_vslt(name):
    logits, _ = _run(name, "vslt")
    assert logits.shape == (2,) and np.isfinite(logits).all()


@pytest.mark.parametrize("name", UNI_IMAGE)
def test_uni_image(name):
    logits, _ = _run(name, "vslt_img")
    assert logits.shape == (2,) and np.isfinite(logits).all()


@pytest.mark.parametrize("name", BI_IMG)
def test_bi_img(name):
    logits, _ = _run(name, "vslt_img")
    assert logits.shape == (2,) and np.isfinite(logits).all()


@pytest.mark.parametrize("name", BI_TXT)
def test_bi_txt(name):
    logits, _ = _run(name, "vslt_txt")
    assert logits.shape == (2,) and np.isfinite(logits).all()


def test_tri_earlyfusion():
    logits, _ = _run("earlyfusion_img_txt_vslt", "vslt_img_txt")
    assert logits.shape == (2,) and np.isfinite(logits).all()


def test_auxcpc_returns_aux_loss():
    logits, aux = _run("auxcpc_grudtxt", "vslt_txt")
    assert logits.shape == (2,)
    assert aux is not None and np.isfinite(float(aux))


def test_auxcpc_modes():
    for aux_type, name in [("cpc", "auxcpc_early"), ("cosine", "auxcpc_mbt"),
                           ("l2", "auxcpc_grudtxt_dir")]:
        cfg = _cfg(name, "vslt_txt").replace(auxiliary_loss_type=aux_type)
        model = get_model(cfg)
        batch = jax.tree.map(jnp.asarray, _batch(cfg))
        missing_num = compute_missing_num(cfg, batch["missing"])
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, batch,
                               missing_num, True)
        _, _, aux = model.apply(variables, batch, missing_num, True)
        assert np.isfinite(float(aux)), aux_type


def _batch_pretrain(cfg, B=2, T_long=36, seed=1):
    """Pretrain-length windows (> t_samples=24) activate the CPC future
    split (auxcpc_early.py:172-180)."""
    rng = np.random.default_rng(seed)
    b = _batch(cfg, B=B, seed=seed)
    b["vslt"] = rng.uniform(0, 1, (B, 3, T_long, cfg.vslt_len)).astype(np.float32)
    b["input_length"] = rng.integers(20, T_long, B).astype(np.int32)
    f = np.zeros((B, 36), np.float32)
    f[:, -12:] = rng.integers(0, 2, (B, 12)).astype(np.float32)
    f[:, -1] = 1.0  # at least one valid target per sample
    b["f_indices"] = f
    return b


def _run_pretrain(model_name, aux_type, det=True):
    cfg = _cfg(model_name, "vslt_txt").replace(auxiliary_loss_type=aux_type)
    model = get_model(cfg)
    batch = jax.tree.map(jnp.asarray, _batch_pretrain(cfg))
    missing_num = compute_missing_num(cfg, batch["missing"])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch,
                           missing_num, True)
    logits, _, aux = model.apply(variables, batch, missing_num, det)
    return np.asarray(logits), aux, variables


@pytest.mark.parametrize("name,aux_type", [
    ("auxcpc_early", "cpc"), ("auxcpc_early", "cosine"),
    ("auxcpc_early", "l2"), ("auxcpc_early", "cpcWbrl"),
    ("auxcpc_early2", "cpc"),
    ("auxcpc_early_direct", "l2"), ("auxcpc_grudtxt", "cpc"),
    ("auxcpc_grudtxt_dir", "cosine"),
    ("auxcpc_mbt", "cpc"), ("auxcpc_mbt_direct", "l2"),
])
def test_auxcpc_predict_wirings_active_on_pretrain_windows(name, aux_type):
    logits, aux, _ = _run_pretrain(name, aux_type)
    assert logits.shape == (2,)
    assert np.isfinite(float(aux))
    assert float(aux) != 0.0, f"{name}/{aux_type} aux should be live"


@pytest.mark.parametrize("name", ["auxcpc_early_ct", "auxcpc_grudtxt_ct",
                                  "auxcpc_mbt_ct"])
def test_auxcpc_ct_mirror(name):
    """_ct wiring: cosine/l2 compare c_t against a mirror cls built from
    the future steps through the SAME fusion (auxcpc_early_ct.py:200-210);
    'cpc' has no branch in the _ct files and contributes 0."""
    _, aux_cos, variables = _run_pretrain(name, "cosine")
    assert np.isfinite(float(aux_cos)) and float(aux_cos) != 0.0
    # shared fusion: no extra encoder params beyond the mirror LayerNorm
    names = {p for p in variables["params"]}
    assert "layer_norms_after_concat_mirror" in names
    _, aux_cpc, _ = _run_pretrain(name, "cpc")
    assert float(aux_cpc) == 0.0


def test_auxcpc_direct_predicts_raw_features():
    """direct wiring: ct_weight maps to the raw feature dim, not D
    (auxcpc_early_direct.py:107)."""
    cfg = _cfg("auxcpc_early_direct", "vslt_txt").replace(
        auxiliary_loss_type="l2")
    model = get_model(cfg)
    batch = jax.tree.map(jnp.asarray, _batch_pretrain(cfg))
    missing_num = compute_missing_num(cfg, batch["missing"])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch,
                           missing_num, True)
    ctw = variables["params"]["ct_weight"]
    assert ctw.shape == (12, cfg.transformer_dim, cfg.vslt_len)

    cfg_p = _cfg("auxcpc_early", "vslt_txt").replace(
        auxiliary_loss_type="l2")
    model_p = get_model(cfg_p)
    variables_p = model_p.init({"params": rng, "dropout": rng}, batch,
                               missing_num, True)
    assert variables_p["params"]["ct_weight"].shape == \
        (12, cfg.transformer_dim, cfg.transformer_dim)


def test_registry_covers_reference_legacy_names():
    names = set(available_models())
    required = set(UNI_VSLT + UNI_IMAGE + BI_IMG + BI_TXT + [
        "binary_lstm", "multi_lstm", "binary_gru_d", "multi_gru_d",
        "resnet_enc", "vit", "earlyfusion_img_vslt_v2", "mbt_v1_img",
        "mbt_v1", "mbt_v2", "bi_cross_transformer_txt_vslt",
        "auxcpc_early", "auxcpc_early2", "auxcpc_early_ct",
        "auxcpc_early_direct", "auxcpc_grudtxt", "auxcpc_grudtxt_ct",
        "auxcpc_grudtxt_dir", "auxcpc_mbt", "auxcpc_mbt_ct",
        "auxcpc_mbt_direct", "earlyfusion_img_txt_vslt",
        "latefusion_vslt_txt_transformer", "multi_t_transformer",
        "binary_f_transformer", "multi_gru_d_t_transformer",
    ])
    missing = required - names
    assert not missing, f"registry missing: {sorted(missing)}"


def test_resnet_backbone_shapes():
    from medical_tri_modal_pilot_tpu.models.resnet import ResNet
    x = jnp.zeros((2, 1, 64, 64))
    for depth, dim in [(18, 256), (50, 1024)]:
        net = ResNet(num_layers=depth)
        vars_ = net.init(jax.random.PRNGKey(0), x)
        pooled = net.apply(vars_, x)
        assert pooled.shape == (2, dim)


def test_maxvit_backbone_shapes():
    from medical_tri_modal_pilot_tpu.models.maxvit import MaxViT
    # 56x56 input: stem->28, stage0->14, stage1->7 (window 7 divides all)
    net = MaxViT(widths=(16, 32), depths=(1, 1), heads=(1, 2), window=7)
    x = jnp.zeros((2, 1, 56, 56))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    pooled = net.apply(vars_, x)
    assert pooled.shape == (2, 32)
    fmap = net.apply(vars_, x, pool=False)
    assert fmap.shape == (2, 7, 7, 32)


def test_location_aware_attention():
    from medical_tri_modal_pilot_tpu.models.extras import LocationAwareAttention
    attn = LocationAwareAttention(dim=16)
    q = jnp.ones((2, 1, 16))
    v = jnp.ones((2, 7, 16))
    vars_ = attn.init(jax.random.PRNGKey(0), q, v)
    ctx, align = attn.apply(vars_, q, v)
    assert ctx.shape == (2, 1, 16) and align.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(align).sum(-1), 1.0, atol=1e-5)


def test_mask_cnn_zeroes_padding():
    from medical_tri_modal_pilot_tpu.models.extras import MaskCNN
    net = MaskCNN(out_channels=4)
    x = jnp.ones((2, 1, 8, 10))
    lengths = jnp.array([10, 4])
    vars_ = net.init(jax.random.PRNGKey(0), x, lengths)
    out, new_lengths = net.apply(vars_, x, lengths)
    out = np.asarray(out)
    assert out.shape[0] == 2
    # sample 1 padded beyond its length: all-zero past position 4
    assert np.abs(out[1, :, :, 4:]).sum() == 0
    assert np.abs(out[0]).sum() > 0
