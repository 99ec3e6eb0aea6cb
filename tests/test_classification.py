"""Classification-mode (hour-bucket) losses end-to-end: bces multi-hot,
softmax, bceandsoftmax, and rmse time-to-event (reference
dataset_new.py:2032-2065, trainer loss dispatch)."""
import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.metrics import Evaluator
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_cls")
    from tools.make_synthetic_fixtures import main as make
    # 24 stays: the fixture RNG stream shifted when event sampling moved
    # ahead of vitals (--signal support); 12 seed-5 stays now leave only 2
    # eligible vasso windows, under the batch size
    make(["--out", str(out), "--n-train", "24", "--n-test", "12",
          "--seed", "5"])
    return str(out)


def _cfg(synth, tmp_path, loss_types, output_dim):
    argv = ["--train-data-path", f"{synth}/train",
            "--test-data-path", f"{synth}/test",
            "--image-data-path", f"{synth}/images/",
            "--biobert-path", f"{synth}/mimic4_embeddings.h5",
            "--input-types", "vslt", "--output-type", "vasso",
            "--model-types", "classification", "--loss-types", loss_types,
            "--output-dim", str(output_dim),
            "--modality-inclusion", "train-missing_test-missing",
            "--model", "unimodal_transformer", "--batch-size", "4",
            "--num-workers", "1", "--TIE-len", "64",
            "--transformer-num-layers", "2", "--transformer-dim", "64",
            "--transformer-num-head", "2", "--precision", "fp32",
            "--dir-result", str(tmp_path / "res")]
    # dir_root -> the fixture's own token files (missing-branch semantics
    # DROP txt1 stays whose key is absent from the token dict)
    return parse_config(argv).replace(seed=412, dir_root=synth)


@pytest.mark.parametrize("loss_types,output_dim", [
    ("bces", 12), ("softmax", 12), ("bceandsoftmax", 12), ("rmse", 1)])
def test_classification_mode_train_eval(synth, tmp_path, loss_types,
                                        output_dim):
    cfg = _cfg(synth, tmp_path, loss_types, output_dim)
    tr, va, te = get_data_loaders(cfg)
    model = get_model(cfg)
    b0 = next(iter(tr))
    if loss_types == "bces":
        assert b0["target"].shape == (4, 12)
    trainer = Trainer(cfg, model, iters_per_epoch=2, sample_batch=b0,
                      seed=412)
    losses = [float(trainer.train_step(b)) for _, b in zip(range(3), tr)]
    assert all(np.isfinite(l) for l in losses), losses
    ev = Evaluator()
    for b in te:
        probs, loss, _ = trainer.eval_step(b)
        assert np.isfinite(loss)
        ev.add_batch(b["target"], probs)
    m = ev.performance_metric()
    assert np.isfinite(m["f1"])


def test_evaluator_multiclass_micro():
    """Integer labels vs [B, K] probs micro-average instead of crashing
    (the reference evaluator cannot consume this shape combination)."""
    ev = Evaluator()
    probs = np.array([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1]])
    ev.add_batch(np.array([0, 1]), probs)
    m = ev.performance_metric()
    assert m["auc"] == 1.0


def test_process_worker_loader_matches_thread(synth, tmp_path):
    """Forked process workers produce the same eval batches as threads."""
    import numpy as np
    cfg = _cfg(synth, tmp_path, "bce", 1).replace(worker_type="thread")
    from medical_tri_modal_pilot_tpu.data.pipeline import get_test_data_loader
    t_batches = list(get_test_data_loader(cfg))
    p_batches = list(get_test_data_loader(cfg.replace(worker_type="process")))
    assert len(t_batches) == len(p_batches) > 0
    for tb, pb in zip(t_batches, p_batches):
        for k in tb:
            np.testing.assert_array_equal(tb[k], pb[k], err_msg=k)
