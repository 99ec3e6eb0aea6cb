"""Reference-checkpoint conversion parity: a reference torch model's
state_dict converted by models/convert_ref.py must make our flax model
reproduce the reference logits end-to-end (the engine of the run-level
golden harness, tools/golden_parity.py)."""
import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.models.convert_ref import (
    merge_reference_state_dict)

from ref_shim import import_reference

BASE = ["--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test"]


def _state_np(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _our_logits(cfg, sd, batch, missing_num):
    model = get_model(cfg)
    variables = jax.jit(model.init, static_argnums=(3,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        batch, missing_num, True)
    variables = merge_reference_state_dict(cfg, dict(variables), sd)
    with jax.default_matmul_precision("highest"):
        logits, _, _ = model.apply(variables, batch, missing_num, True)
    return np.asarray(logits)


def test_unimodal_checkpoint_conversion():
    argv = BASE + ["--input-types", "vslt", "--output-type", "mortality",
                   "--model", "unimodal_transformer", "--vslt-type", "TIE",
                   "--transformer-num-layers", "2", "--transformer-dim", "64",
                   "--transformer-num-head", "4", "--batch-size", "5", "--dropout", "0.0"]
    ref = import_reference(argv)
    args = ref["args"]
    args.device = torch.device("cpu")
    torch.manual_seed(3)
    ref_mod = importlib.import_module(
        "builder.models.8_missing_models.unimodal_transformer")
    ref_model = ref_mod.UNIMODAL_TRANSFORMER(args)
    ref_model.eval()

    B, L = 5, 16
    rng = np.random.default_rng(7)
    tie = np.zeros((B, L, 3), np.float32)
    lengths = np.array([16, 4, 9, 1, 12])
    for i, ln in enumerate(lengths):
        tie[i, :ln, 0] = np.sort(rng.uniform(-24, 0, ln))
        tie[i, :ln, 1] = rng.uniform(0, 1, ln)
        tie[i, :ln, 2] = rng.integers(0, 18, ln)
    age = rng.uniform(0, 1, B).astype(np.float32)
    gen = rng.integers(0, 2, B).astype(np.float32)
    with torch.no_grad():
        ref_logits, _, _ = ref_model(
            torch.tensor(tie), None, None, None, None,
            torch.tensor(age), torch.tensor(gen), torch.tensor(lengths),
            None, None, None, None, None, None, None, "test", None, None)

    cfg = parse_config(argv + ["--precision", "fp32"])
    batch = {"vslt": jnp.asarray(tie),
             "static": jnp.asarray(np.stack([gen, age], axis=1)),
             "input_length": jnp.asarray(lengths),
             "missing": jnp.zeros((B, 3))}
    ours = _our_logits(cfg, _state_np(ref_model), batch,
                       jnp.zeros(B, jnp.int32))
    np.testing.assert_allclose(ours, ref_logits.numpy()[:, 0], atol=2e-4)


def test_bi_vslttxt_checkpoint_conversion():
    """bi_vslttxt_mbt_v1: missing-selected cls-vector mean -> one shared BN
    head (bi_vslttxt_mbt_v1.py:167-183) — converted logits match for both
    missing cases."""
    argv = BASE + ["--input-types", "vslt_txt", "--output-type", "mortality",
                   "--model", "bi_vslttxt_mbt_v1", "--vslt-type", "TIE",
                   "--transformer-num-layers", "2", "--transformer-dim", "64",
                   "--transformer-num-head", "4", "--batch-size", "6", "--dropout", "0.0",
                   "--imgtxt-time", "1",
                   "--fullmodal-definition", "txt1"]
    ref = import_reference(argv)
    args = ref["args"]
    args.device = torch.device("cpu")
    torch.manual_seed(11)
    ref_mod = importlib.import_module(
        "builder.models.8_missing_models.bi_vslttxt_mbt_v1")
    ref_model = ref_mod.BI_VSLTTXT_MBT_V1(args)
    ref_model.eval()

    B, L = 6, 20
    rng = np.random.default_rng(11)
    tie = np.zeros((B, L, 3), np.float32)
    lengths = np.array([20, 5, 11, 20, 8, 3])
    for i, ln in enumerate(lengths):
        tie[i, :ln, 0] = np.sort(rng.uniform(-24, 0, ln))
        tie[i, :ln, 1] = rng.uniform(0, 1, ln)
        tie[i, :ln, 2] = rng.integers(0, 18, ln)
    age = rng.uniform(0, 1, B).astype(np.float32)
    gen = rng.integers(0, 2, B).astype(np.float32)
    txts = rng.normal(0, 1, (B, 128, 768)).astype(np.float32)
    txt_lengths = np.array([4, 0, 60, 126, 1, 9])
    txt_time = rng.uniform(-24, 0, B).astype(np.float32)
    missing_num = np.array([0, 1, 0, 1, 0, 1])

    with torch.no_grad():
        ref_logits, _, _ = ref_model(
            torch.tensor(tie), None, None, None, None,
            torch.tensor(age), torch.tensor(gen), torch.tensor(lengths),
            torch.tensor(txts), torch.tensor(txt_lengths),
            None, torch.tensor(missing_num), None, None,
            torch.tensor(txt_time), "test", None, None)

    cfg = parse_config(argv + ["--precision", "fp32"])
    batch = {"vslt": jnp.asarray(tie),
             "static": jnp.asarray(np.stack([gen, age], axis=1)),
             "input_length": jnp.asarray(lengths),
             "txt": jnp.asarray(txts),
             "txt_length": jnp.asarray(txt_lengths),
             "txt_time": jnp.asarray(txt_time),
             "missing": jnp.zeros((B, 3))}
    ours = _our_logits(cfg, _state_np(ref_model), batch,
                       jnp.asarray(missing_num))
    np.testing.assert_allclose(ours, ref_logits.numpy(), atol=3e-4)


def test_flagship_checkpoint_conversion():
    """tri_mbt_vsltcls with the full frozen-swin image path (d=256 — the
    reference hardcodes Linear(768,256), tri_mbt_vsltcls.py:118)."""
    argv = BASE + ["--input-types", "vslt_img_txt", "--output-type",
                   "mortality", "--model", "tri_mbt_vsltcls",
                   "--vslt-type", "TIE", "--transformer-num-layers", "1",
                   "--transformer-dim", "256", "--transformer-num-head", "4",
                   "--batch-size", "2", "--dropout", "0.0", "--imgtxt-time", "1",
                   "--img-model-type", "swin", "--img-pretrain", "No"]
    ref = import_reference(argv)
    args = ref["args"]
    args.device = torch.device("cpu")

    import builder.models.src.swin_transformer as ref_swin

    def fake_state_dict(progress=True):
        torch.manual_seed(21)
        m = ref_swin.SwinTransformer(
            patch_size=[4, 4], embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], window_size=[7, 7],
            stochastic_depth_prob=0.2, num_classes=1000)
        return m.state_dict()

    ref_swin.Swin_T_Weights.IMAGENET1K_V1.get_state_dict = fake_state_dict
    torch.manual_seed(5)
    ref_mod = importlib.import_module(
        "builder.models.8_missing_models.tri_mbt_vsltcls")
    ref_model = ref_mod.TRI_MBT_VSLTCLS(args)
    ref_model.eval()

    B, L = 2, 24
    rng = np.random.default_rng(5)
    tie = np.zeros((B, L, 3), np.float32)
    lengths = np.array([24, 9])
    for i, ln in enumerate(lengths):
        tie[i, :ln, 0] = np.sort(rng.uniform(-24, 0, ln))
        tie[i, :ln, 1] = rng.uniform(0, 1, ln)
        tie[i, :ln, 2] = rng.integers(0, 18, ln)
    age = rng.uniform(0, 1, B).astype(np.float32)
    gen = rng.integers(0, 2, B).astype(np.float32)
    txts = rng.normal(0, 1, (B, 128, 768)).astype(np.float32)
    txt_lengths = np.array([17, 0])
    img = rng.uniform(0, 1, (B, 1, 224, 224)).astype(np.float32)
    img_time = rng.uniform(-24, 0, B).astype(np.float32)
    txt_time = rng.uniform(-24, 0, B).astype(np.float32)
    missing_num = np.array([0, 3])

    with torch.no_grad():
        ref_logits, _, _ = ref_model(
            torch.tensor(tie), None, None, None, None,
            torch.tensor(age), torch.tensor(gen), torch.tensor(lengths),
            torch.tensor(txts), torch.tensor(txt_lengths),
            torch.tensor(img), torch.tensor(missing_num), None,
            torch.tensor(img_time), torch.tensor(txt_time), "test",
            None, None)

    cfg = parse_config(argv + ["--precision", "fp32"])
    batch = {"vslt": jnp.asarray(tie),
             "static": jnp.asarray(np.stack([gen, age], axis=1)),
             "input_length": jnp.asarray(lengths),
             "img": jnp.asarray(img),
             "img_time": jnp.asarray(img_time),
             "txt": jnp.asarray(txts),
             "txt_length": jnp.asarray(txt_lengths),
             "txt_time": jnp.asarray(txt_time),
             "missing": jnp.zeros((B, 3))}
    ours = _our_logits(cfg, _state_np(ref_model), batch,
                       jnp.asarray(missing_num))
    np.testing.assert_allclose(ours, ref_logits.numpy()[:, 0], atol=2e-3)
