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
        probs, loss, _ = trainer.eval_step(batch)
        assert probs.shape == (cfg.batch_size,)
        assert np.all((probs >= 0) & (probs <= 1))
        logger.evaluator.add_batch(batch["target"], probs)
    m = logger.evaluator.performance_metric()
    assert np.isfinite(m["auc"])

    logger.val_results = m
    logger.save(trainer.state, step=3, epoch=1)
    logger.wait_saves()   # saves are async; join before reading back
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


def test_tensor_parallel_sharded_step_matches_dp():
    """--mp-size 2 builds a ('data','model') mesh, tensor-shards the
    transformer FFN/attention matmuls (parallel/mesh.py layout) and the
    matching optimizer moments, and produces the same loss as pure DP."""
    import jax
    import jax.tree_util as jtu
    from __graft_entry__ import _synthetic_batch, _tiny_cfg
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(16)
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, 16)

    dp = Trainer(cfg.replace(dp_size=8), model, 10, batch)
    tp = Trainer(cfg.replace(dp_size=4, mp_size=2), model, 10, batch)
    assert dict(tp.mesh.shape) == {"data": 4, "model": 2}

    def sharded_leaves(tree):
        return {jtu.keystr(kp) for kp, leaf in jtu.tree_leaves_with_path(tree)
                if any(s is not None for s in leaf.sharding.spec)}

    p_sharded = sharded_leaves(tp.state.params)
    assert any("feed_forward']['w_1']['kernel" in k for k in p_sharded)
    assert any("query_proj']['kernel" in k for k in p_sharded)
    # optimizer moments follow the same layout (mu/nu carry the param path)
    o_sharded = sharded_leaves(tp.state.opt_state)
    assert any("w_1" in k for k in o_sharded)

    loss_dp = float(dp.train_step(batch))
    loss_tp = float(tp.train_step(batch))
    assert abs(loss_dp - loss_tp) < 1e-4
    probs_dp, *_ = dp.eval_step(batch)
    probs_tp, *_ = tp.eval_step(batch)
    import numpy as np
    np.testing.assert_allclose(np.asarray(probs_dp), np.asarray(probs_tp),
                               atol=1e-4)


def test_remat_matches_plain_step():
    """--remat 1 rematerializes encoder layers (flax nn.remat); the param
    tree and the loss must match the plain step (same math, recomputed)."""
    from __graft_entry__ import _synthetic_batch, _tiny_cfg
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.models.modules import set_remat
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(8)
    batch = _synthetic_batch(cfg, 8)
    try:
        plain = Trainer(cfg, get_model(cfg), 10, batch)
        l0 = float(plain.train_step(batch))
        remat = Trainer(cfg.replace(remat=1), get_model(cfg), 10, batch)
        import jax
        assert jax.tree.structure(remat.state.params) == \
            jax.tree.structure(plain.state.params)
        l1 = float(remat.train_step(batch))
    finally:
        set_remat(False)
    assert abs(l0 - l1) < 1e-5


def test_rbg_prng_trains():
    """--prng rbg (the TPU default) must also run on CPU: finite loss and
    a param-update step, with the PRNG impl restored afterwards."""
    import jax
    from __graft_entry__ import _synthetic_batch, _tiny_cfg
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(8).replace(prng="rbg")
    batch = _synthetic_batch(cfg, 8)
    try:
        tr = Trainer(cfg, get_model(cfg), 10, batch)
        l0 = float(tr.train_step(batch))
        l1 = float(tr.train_step(batch))
        assert l0 == l0 and l1 == l1
        assert l0 != l1   # params moved
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
