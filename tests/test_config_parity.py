"""CLI-surface parity: every option string the reference declares
(control/config.py — including the commented-out missing-modality block,
lines 13/73-79, which reference commands still pass) must be accepted by
our parser, and --multitoken must drive the train-time target repeat
(builder/trainer/trainer.py:57-66)."""
import re

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from medical_tri_modal_pilot_tpu.config import build_parser, parse_config
from medical_tri_modal_pilot_tpu.train.trainer import (Trainer,
                                                       multitoken_targets)

REF_CONFIG = "/root/reference/control/config.py"


def _reference_option_strings():
    opts = []
    with open(REF_CONFIG) as f:
        for line in f:
            line = line.strip().lstrip("#").strip()
            m = re.match(r"parser\.add_argument\('(--[A-Za-z0-9_-]+)'", line)
            if m:
                opts.append(m.group(1))
    assert len(opts) > 80, "reference flag extraction looks broken"
    return opts


def test_every_reference_flag_parses():
    ours = set()
    for action in build_parser()._actions:
        ours.update(action.option_strings)
    missing = [o for o in _reference_option_strings() if o not in ours]
    assert not missing, f"reference flags our parser rejects: {missing}"


def test_inert_flags_accepted_with_reference_defaults():
    cfg = parse_config(["--multitoken", "1", "--collate", "2",
                        "--quantization", "x", "--show-roc", "y",
                        "--usepe", "z"])
    assert cfg.multitoken == 1 and cfg.collate == 2
    # reference used type=bool: any non-empty string parses truthy
    assert cfg.quantization and cfg.show_roc and cfg.usepe
    d = parse_config([])
    assert (d.multitoken, d.collate, d.quantization, d.show_roc, d.usepe) == \
        (0, 2, False, False, False)


def test_multitoken_target_repeat_layout():
    cfg = parse_config(["--multitoken", "1", "--fullmodal-definition", "txt1",
                        "--input-types", "vslt_txt"])
    t = jnp.asarray(np.arange(3.0))
    rep = multitoken_targets(cfg, t)
    # sample-major interleave: t0,t0,t1,t1,... (ref trainer.py:58
    # repeat(2,1,1).permute(1,0,2).reshape(-1,12))
    np.testing.assert_array_equal(np.asarray(rep), [0, 0, 1, 1, 2, 2])
    # trimodal or flag off: unchanged
    cfg_off = parse_config([])
    np.testing.assert_array_equal(np.asarray(multitoken_targets(cfg_off, t)),
                                  np.asarray(t))


class _TwoTokenModel(nn.Module):
    """Bimodal multitoken stand-in: emits one logit per candidate token
    ([2B] sample-major) in train flow, one per sample in eval."""

    @nn.compact
    def __call__(self, batch, missing_num, deterministic: bool = True):
        x = batch["vslt"].reshape(batch["vslt"].shape[0], -1)
        h = nn.Dense(1)(x)[:, 0]
        if deterministic:
            return h, None, None
        return jnp.repeat(h, 2, axis=0), None, None


def _toy_batch(B):
    rng = np.random.default_rng(0)
    return {
        "vslt": rng.normal(size=(B, 8, 3)).astype(np.float32),
        "static": rng.uniform(size=(B, 2)).astype(np.float32),
        "target": rng.integers(0, 2, B).astype(np.float32),
        "target_aux": np.zeros(B, np.float32),
        "input_length": np.full(B, 8, np.int32),
        "missing": np.stack([np.zeros(B), np.zeros(B),
                             rng.integers(0, 2, B)], 1).astype(np.float32),
    }


def test_multitoken_classification_train_step():
    cfg = parse_config([
        "--multitoken", "1", "--fullmodal-definition", "txt1",
        "--input-types", "vslt_txt", "--model-types", "classification",
        "--loss-types", "bces", "--model", "toy_twotoken",
        "--batch-size", "8", "--use-pallas", "0", "--precision", "fp32",
    ])
    batch = _toy_batch(8)
    trainer = Trainer(cfg, _TwoTokenModel(), iters_per_epoch=4,
                      sample_batch=batch)
    losses = [float(trainer.train_step(batch)) for _ in range(3)]
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], "loss should decrease on a toy problem"
    probs, eval_loss, _ = trainer.eval_step(batch)
    assert probs.shape == (8,)
    assert np.isfinite(eval_loss)


def test_worker_type_auto_resolution(monkeypatch, tmp_path):
    """--worker-type auto resolves to 'native' when the built C++ assembler
    is present and pins the 'thread' fallback when it is absent (the
    TPU-first default must never leave a host without the .so broken)."""
    import medical_tri_modal_pilot_tpu.config as C
    # absent .so -> thread
    monkeypatch.setattr(C, "native_lib_path",
                        lambda: str(tmp_path / "nope.so"))
    assert parse_config([]).worker_type == "thread"
    # present .so -> native
    lib = tmp_path / "libtie_assembler.so"
    lib.write_bytes(b"")
    monkeypatch.setattr(C, "native_lib_path", lambda: str(lib))
    assert parse_config([]).worker_type == "native"
    # explicit values are never overridden
    assert parse_config(["--worker-type", "thread"]).worker_type == "thread"
    monkeypatch.setattr(C, "native_lib_path",
                        lambda: str(tmp_path / "nope.so"))
    assert parse_config(["--worker-type", "native"]).worker_type == "native"
