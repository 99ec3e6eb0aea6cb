"""Tri-modal end-to-end on synthetic fixtures (images + BioBERT h5 + token
files), exercising missing-modality batches through train and eval."""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    from tools.make_synthetic_fixtures import main as make
    make(["--out", str(out), "--n-train", "12", "--n-test", "6",
          "--seed", "3"])
    return str(out)


def _cfg(synth, tmp_path, model, itypes, extra=()):
    argv = ["--train-data-path", f"{synth}/train",
            "--test-data-path", f"{synth}/test",
            "--image-data-path", f"{synth}/images/",
            "--biobert-path", f"{synth}/mimic4_embeddings.h5",
            "--input-types", itypes, "--output-type", "intubation",
            "--modality-inclusion", "train-missing_test-missing",
            "--model", model, "--batch-size", "4", "--num-workers", "2",
            "--TIE-len", "64", "--transformer-num-layers", "2",
            "--transformer-dim", "64", "--transformer-num-head", "2",
            "--img-model-type", "resnet18", "--imgtxt-time", "1",
            "--precision", "fp32",
            "--dir-result", str(tmp_path / "res")] + list(extra)
    return parse_config(argv).replace(dir_root=synth, seed=412)


@pytest.mark.parametrize("model,itypes", [
    ("tri_mbt_vsltcls", "vslt_img_txt"),
    ("tri_mbt_vmulti", "vslt_img_txt"),
    ("bitxt_mbt_vsltcls", "vslt_txt"),
])
def test_trimodal_train_and_eval(synth, tmp_path, model, itypes):
    cfg = _cfg(synth, tmp_path, model, itypes)
    train_loader, _val, test_loader = get_data_loaders(cfg)
    assert len(train_loader) > 0
    m = get_model(cfg)
    sample = next(iter(train_loader))
    # fixtures must exercise real (non-missing) images and text somewhere
    trainer = Trainer(cfg, m, len(train_loader), sample, seed=412)
    losses = [float(trainer.train_step(b)) for b in train_loader]
    assert all(np.isfinite(losses)), losses
    seen_missing = []
    for b in test_loader:
        probs, loss, _ = trainer.eval_step(b)
        assert np.all(np.isfinite(probs))
        seen_missing.append(b["missing"])
    if seen_missing:
        mm = np.concatenate(seen_missing)
        assert mm.shape[1] == 3


def test_fixture_images_actually_load(synth, tmp_path):
    cfg = _cfg(synth, tmp_path, "tri_mbt_vsltcls", "vslt_img_txt")
    train_loader, _v, _t = get_data_loaders(cfg)
    got_real_img = False
    got_real_txt = False
    for batch in train_loader:
        got_real_img |= bool((batch["missing"][:, 1] == 0).any()
                             and np.abs(batch["img"]).sum() > 0)
        got_real_txt |= bool((batch["missing"][:, 2] == 0).any()
                             and np.abs(batch["txt"]).sum() > 0)
    assert got_real_img, "no real image made it through the pipeline"
    assert got_real_txt, "no real text made it through the pipeline"


def test_auto_img_pack_frac(synth, tmp_path):
    """--img-pack-frac -1 resolves from the train sampler distribution:
    p(image-capable draw) + 3.5 sigma + 1/B, clamped to (0, 1]. The swin
    capacity this sizes is overflow-safe (in-graph full-batch fallback),
    so the resolver only has to be a sound upper-bound estimate."""
    from medical_tri_modal_pilot_tpu.data.pipeline import auto_img_pack_frac

    cfg = _cfg(synth, tmp_path, "tri_mbt_vsltcls", "vslt_img_txt")
    assert cfg.img_pack_frac == -1.0          # the auto default
    train_loader, _v, _t = get_data_loaders(cfg)
    frac = auto_img_pack_frac(train_loader)
    assert 0.0 < frac <= 1.0

    # exact formula against the loader's own sampler/type_list
    types = np.asarray(train_loader.dataset.type_list)
    p = float(np.isin(types, (0, 5)).astype(np.float64)
              @ train_loader.sampler.probs)
    B = max(2, cfg.batch_size)
    want = min(1.0, max(2.0 / B, p + 3.5 * np.sqrt(p * (1 - p) / B) + 1 / B))
    assert abs(frac - want) < 1e-12

    # a resolved cfg trains (the model reads the static capacity from it)
    cfg2 = cfg.replace(img_pack_frac=frac, img_model_type="swin",
                       image_size=224)
    m = get_model(cfg2)
    sample = next(iter(train_loader))
    trainer = Trainer(cfg2, m, len(train_loader), sample, seed=412)
    loss = float(trainer.train_step(sample))
    assert np.isfinite(loss)

    # full-modality regimes: every row carries an image
    cfg3 = _cfg(synth, tmp_path, "tri_mbt_vsltcls", "vslt_img_txt")
    cfg3 = cfg3.replace(modality_inclusion="train-full_test-full")
    tl3, _v3, _t3 = get_data_loaders(cfg3)
    assert auto_img_pack_frac(tl3) == 1.0
