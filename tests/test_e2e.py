"""End-to-end smoke: tiny training runs on sample data (CPU), checkpoint
contract, and the multi-chip dryrun on the virtual 8-device mesh."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.checkpoints import (ckpt_path,
                                                           load_checkpoint)
from medical_tri_modal_pilot_tpu.train.logger import Logger
from medical_tri_modal_pilot_tpu.train.trainer import Trainer

BASE = ["--train-data-path", "/root/reference/data/sample_data/train",
        "--test-data-path", "/root/reference/data/sample_data/test",
        "--batch-size", "2", "--num-workers", "1",
        "--TIE-len", "64", "--transformer-num-layers", "2",
        "--transformer-dim", "64", "--transformer-num-head", "2",
        "--precision", "fp32"]


def test_unimodal_train_eval_ckpt(tmp_path):
    argv = BASE + ["--input-types", "vslt", "--output-type", "intubation",
                   "--modality-inclusion", "train-missing_test-missing",
                   "--model", "unimodal_transformer",
                   "--dir-result", str(tmp_path / "res"),
                   "--project-name", "t1"]
    cfg = parse_config(argv).replace(dir_root="/root/reference", seed=412)
    train_loader, _val, test_loader = get_data_loaders(cfg)
    assert len(train_loader) > 0 and len(test_loader) > 0
    model = get_model(cfg)
    sample = next(iter(train_loader))
    trainer = Trainer(cfg, model, len(train_loader), sample, seed=412)
    losses = []
    for batch in train_loader:
        losses.append(float(trainer.train_step(batch)))
    assert all(np.isfinite(losses)), losses

    logger = Logger(cfg, fold=0, seed=412)
    logger.evaluator.reset()
    for batch in test_loader:
        probs, loss = trainer.eval_step(batch)
        assert probs.shape == (cfg.batch_size,)
        assert np.all((probs >= 0) & (probs <= 1))
        logger.evaluator.add_batch(batch["target"], probs)
    m = logger.evaluator.performance_metric()
    assert np.isfinite(m["auc"])

    logger.val_results = m
    logger.save(trainer.state, step=3, epoch=1)
    best = ckpt_path(cfg.dir_result, cfg.project_name, "best", 0, 412)
    assert os.path.exists(best)
    payload = load_checkpoint(best)
    assert set(payload) >= {"model", "optimizer", "score", "epoch"}
    logger.close()


def test_dryrun_multichip_8_devices():
    import jax
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
