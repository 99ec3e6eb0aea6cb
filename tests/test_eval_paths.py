"""Previously-untested shipped paths (round-1 verdict weak #5):
--image/text-observed-prop eval-time modality dropout through the
3_test-style loader, and multiimages=1 end-to-end."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.pipeline import (get_data_loaders,
                                                       get_test_data_loader)
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_eval")
    from tools.make_synthetic_fixtures import main as make
    make(["--out", str(out), "--n-train", "12", "--n-test", "24",
          "--seed", "3"])
    return str(out)


def _cfg(synth, tmp_path, extra=()):
    argv = ["--train-data-path", f"{synth}/train",
            "--test-data-path", f"{synth}/test",
            "--image-data-path", f"{synth}/images/",
            "--biobert-path", f"{synth}/mimic4_embeddings.h5",
            "--input-types", "vslt_img_txt", "--output-type", "intubation",
            "--modality-inclusion", "train-missing_test-missing",
            "--model", "tri_mbt_vsltcls", "--batch-size", "4",
            "--num-workers", "1", "--TIE-len", "64",
            "--transformer-num-layers", "1", "--transformer-dim", "32",
            "--transformer-num-head", "2", "--img-model-type", "resnet18",
            "--precision", "fp32",
            "--dir-result", str(tmp_path / "res")] + list(extra)
    return parse_config(argv).replace(dir_root=synth, seed=412)


def _missing_rates(cfg):
    loader = get_test_data_loader(cfg)
    assert len(loader) > 0
    miss = np.concatenate([b["missing"] for b in loader])
    return miss[:, 1].mean(), miss[:, 2].mean()   # img, txt missing rates


def test_observed_prop_drops_modalities(synth, tmp_path):
    """--image-observed-prop 10 must mark far more images missing than the
    default 100 (reference dataset_new.py:1442-1508); same for text.

    Note: eval images only load for remapped type codes {0, 5} — the
    reference gates its eval getitem on the POST-remap code list with the
    PRE-remap image-available set [0,2,3,5] (dataset_new.py:1203 vs :1424),
    silently dropping images for codes 1/4; we reproduce that bug-for-bug
    (the structural index parity test pins the codes), so the fixture needs
    enough test stays for code-0/5 samples to exist."""
    img_full, txt_full = _missing_rates(_cfg(synth, tmp_path))
    assert img_full < 1.0, "fixture must yield some eval-loadable images"
    img_10, txt_10 = _missing_rates(_cfg(
        synth, tmp_path, ("--image-observed-prop", "10")))
    assert img_10 > img_full, (img_10, img_full)
    assert txt_10 == pytest.approx(txt_full), "text must be untouched"
    _, txt_only_10 = _missing_rates(_cfg(
        synth, tmp_path, ("--text-observed-prop", "10")))
    assert txt_only_10 > txt_full

    # dropped modalities must still evaluate (missing-flag propagation)
    cfg = _cfg(synth, tmp_path, ("--image-observed-prop", "10",
                                 "--text-observed-prop", "10"))
    loader = get_test_data_loader(cfg)
    model = get_model(cfg)
    trainer = Trainer(cfg, model, 1, next(iter(loader)), seed=412,
                      eval_only=True)
    for batch in loader:
        probs, loss, _ = trainer.eval_step(batch)
        assert np.all(np.isfinite(probs))
        assert np.isfinite(loss)


def test_multiimages_end_to_end(synth, tmp_path):
    """--multiimages 1 (3 stacked CXRs, 147 patch tokens with
    count-nonzero lengths — tri_mbt_vsltcls.py:226-232) trains and evals
    on fixtures that ship real jpegs."""
    cfg = _cfg(synth, tmp_path, ("--multiimages", "1",
                                 "--img-model-type", "swin",
                                 "--image-size", "224"))
    train_loader, _val, test_loader = get_data_loaders(cfg)
    assert len(train_loader) > 0
    batch = next(iter(train_loader))
    assert batch["img"].shape[1] == 3, "multiimages must stack 3 slots"
    model = get_model(cfg)
    trainer = Trainer(cfg, model, len(train_loader), batch, seed=412)
    loss = float(trainer.train_step(batch))
    assert np.isfinite(loss)
    for b in test_loader:
        probs, *_ = trainer.eval_step(b)
        assert np.all(np.isfinite(probs))
        break
