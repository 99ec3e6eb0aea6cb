"""Component-level timing of the flagship step on the real TPU.

Times (best of K windows, value-materialization barrier — see
BASELINE_MEASURED.md): swin fwd alone, full model fwd, full train step;
prints one line per component. Usage: python tools/profile_tpu.py [swin|fwd|step|all]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BATCH = 64
ITERS = 10
WINDOWS = 3


def bench(fn, *args, iters=ITERS, windows=WINDOWS):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from medical_tri_modal_pilot_tpu import ops
    from medical_tri_modal_pilot_tpu.config import parse_config
    from medical_tri_modal_pilot_tpu.models import get_model
    from medical_tri_modal_pilot_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_batch

    argv = [
        "--input-types", "vslt_img_txt", "--output-type", "intubation",
        "--modality-inclusion", "train-missing_test-missing",
        "--model", "tri_mbt_vsltcls", "--batch-size", str(BATCH),
        "--TIE-len", "1000", "--transformer-num-layers", "6",
        "--transformer-dim", "256", "--transformer-num-head", "4",
        "--img-model-type", "swin", "--imgtxt-time", "1",
        "--precision", "bf16",
    ]
    cfg = parse_config(argv)
    ops.configure(bool(cfg.use_pallas) and jax.default_backend() == "tpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    if which in ("swin", "all"):
        from medical_tri_modal_pilot_tpu.models.swin import SwinTransformer
        m = SwinTransformer(in_channels=1, dtype=jnp.bfloat16)
        img = jnp.asarray(np.random.rand(BATCH, 1, 224, 224), jnp.bfloat16)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), img)
        f = jax.jit(lambda p, x: m.apply(p, x))
        print(f"swin fwd b{BATCH} bf16: {bench(f, params, img):.1f} ms")

    if which in ("fwd", "step", "all"):
        model = get_model(cfg)
        batch = _synthetic_batch(cfg, BATCH)
        trainer = Trainer(cfg, model, iters_per_epoch=100, sample_batch=batch)
        dbatch = trainer._device_batch(batch)
        if which in ("fwd", "all"):
            from medical_tri_modal_pilot_tpu.train.trainer import compute_missing_num
            mn = compute_missing_num(cfg, dbatch["missing"])
            fwd = jax.jit(lambda p, b: model.apply(
                {"params": p, "batch_stats": trainer.state.batch_stats},
                b, mn, True)[0])
            print(f"model fwd: {bench(fwd, trainer.state.params, dbatch):.1f} ms")
        if which in ("step", "all"):
            rng = jax.random.PRNGKey(0)
            def step():
                trainer.state, loss = trainer._train_step(
                    trainer.state, dbatch, rng)
                return loss
            print(f"train step: {bench(lambda: step()):.1f} ms")
            try:
                cost = trainer._train_step.lower(
                    trainer.state, dbatch, rng).compile().cost_analysis()
                flops = cost.get("flops", 0.0)
                print(f"step flops (XLA cost analysis): {flops/1e9:.1f} GFLOP")
            except Exception as e:
                print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
