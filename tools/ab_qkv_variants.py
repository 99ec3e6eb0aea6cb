"""Interleaved A/B of the QKV-projection dispatch variants on the real
TPU: LN-fused 3-output kernel vs plain XLA projections (same trainer
state, alternating windows so tunnel load is shared between variants).

Run from the repo root: python tools/ab_qkv_variants.py

Measured 2026-08-17 (flagship step, batch 64, TIE-1000, bf16, packed
swin), best of 4 interleaved windows:
  lnfused3 (pallas_rowskip_ln_affine, 3 outputs)  51.3 ms/step
  plain (XLA matmuls + separate StdLN)            53.9 ms/step
  skip  (pallas_rowskip_affine, 1 output)         57.8 ms/step  <- slower:
        the row-skip saves fewer flops than the lost XLA fusion and the
        concat-output slice copies cost; hence ops.configure dispatches
        only the LN-fused variant (_QKV_IMPL stays None).

(The numbers above predate kernels/attn_block.py; this tool now disables
the fused attention block so the two projection variants still compile
distinct programs — production dispatch prefers the fused block.)
"""
import time
import numpy as np
import jax

from medical_tri_modal_pilot_tpu import ops
from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.models import get_model, modules as M
from medical_tri_modal_pilot_tpu.kernels.rowmm import (pallas_rowskip_affine,
    pallas_rowskip_ln_affine)
from medical_tri_modal_pilot_tpu.train.trainer import Trainer
from __graft_entry__ import _synthetic_batch

BATCH, ITERS, ROUNDS = 64, 30, 4

argv = ["--input-types", "vslt_img_txt", "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", "tri_mbt_vsltcls", "--batch-size", str(BATCH),
        "--TIE-len", "1000", "--transformer-num-layers", "6",
        "--transformer-dim", "256", "--transformer-num-head", "4",
        "--img-model-type", "swin", "--imgtxt-time", "1",
        "--precision", "bf16"]
cfg = parse_config(argv)
ops.configure(True)
model = get_model(cfg)
batch = _synthetic_batch(cfg, BATCH)
r = np.random.default_rng(7)
pres = r.random(BATCH) < 0.25
batch["missing"][:, 1] = 1.0 - pres
batch["img"] = (batch["img"] * pres[:, None, None, None]).astype(np.float32)
batch["img_time"] = np.where(pres, batch["img_time"], -1.0).astype(np.float32)
trainer = Trainer(cfg, model, iters_per_epoch=100, sample_batch=batch)
dbatch = trainer._device_batch(batch)
rng = jax.random.PRNGKey(0)

steps = {}
VARIANTS = (("lnfused3", None, pallas_rowskip_ln_affine),
            ("plain", None, None))
# the fused attention-block impl short-circuits MultiHeadAttention before
# either QKV variant is consulted — disable it so the A/B actually
# compiles two different programs (it is what ops.configure dispatches in
# production; this tool isolates the projection-variant question)
M.set_attn_block_impl(None)
for name, impl, lnimpl in VARIANTS:
    M.set_qkv_impl(impl)
    M.set_qkv_ln_impl(lnimpl)
    fn = jax.jit(lambda s, b, r: trainer._train_step_impl(s, b, r))
    for _ in range(3):
        trainer.state, loss = fn(trainer.state, dbatch, rng)
    _ = float(loss)
    steps[name] = fn

best = {n: float("inf") for n, _, _ in VARIANTS}
for rd in range(ROUNDS):
    for name, _, _ in VARIANTS:
        fn = steps[name]
        t0 = time.perf_counter()
        for _ in range(ITERS):
            trainer.state, loss = fn(trainer.state, dbatch, rng)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        best[name] = min(best[name], dt)
        print(f"round {rd} {name}: {dt:.1f} ms/step", flush=True)
print({k: round(v, 2) for k, v in best.items()})
