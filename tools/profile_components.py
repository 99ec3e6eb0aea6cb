"""Component-level step decomposition on the real TPU (manual timing —
the tunneled backend has no working trace profiler).

Times, with value-materialization barriers, best of N windows each:
  full      fwd+bwd+AdamW train step (bench configuration)
  fwd       loss forward only
  swin      packed frozen Swin trunk forward alone (capacity rows)
  fusion    6-layer MBT fusion fwd+bwd alone (streams pre-built)
  opt       AdamW update alone (grads precomputed)

Run from the repo root: python tools/profile_components.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medical_tri_modal_pilot_tpu import ops
from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.trainer import Trainer
from __graft_entry__ import _synthetic_batch

BATCH, ITERS, ROUNDS = 64, 20, 3


def _windows(fn, *args):
    best = float("inf")
    state = args
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*state)
        jax.tree_util.tree_map(
            lambda x: None, out)
        # materialize one leaf as the barrier
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
    return best


def main():
    argv = ["--input-types", "vslt_img_txt", "--output-type", "intubation",
            "--modality-inclusion", "train-missing_test-missing",
            "--model", "tri_mbt_vsltcls", "--batch-size", str(BATCH),
            "--TIE-len", "1000", "--transformer-num-layers", "6",
            "--transformer-dim", "256", "--transformer-num-head", "4",
            "--img-model-type", "swin", "--imgtxt-time", "1",
            "--precision", "bf16"]
    cfg = parse_config(argv)
    ops.configure(bool(cfg.use_pallas) and jax.default_backend() == "tpu")
    model = get_model(cfg)
    batch = _synthetic_batch(cfg, BATCH)
    r = np.random.default_rng(7)
    pres = r.random(BATCH) < 0.25
    batch["missing"][:, 1] = 1.0 - pres
    batch["img"] = (batch["img"] * pres[:, None, None, None]).astype(np.float32)
    batch["img_time"] = np.where(pres, batch["img_time"],
                                 -1.0).astype(np.float32)
    trainer = Trainer(cfg, model, iters_per_epoch=100, sample_batch=batch)
    dbatch = trainer._device_batch(batch)
    rng = jax.random.PRNGKey(0)

    results = {}

    def _record(name, val):
        results[name] = round(val, 2)
        print(f"{name}: {results[name]} ms", flush=True)

    # full step
    step = jax.jit(lambda s, b, k: trainer._train_step_impl(s, b, k))
    st, _ = step(trainer.state, dbatch, rng)
    _record("full", _windows(lambda: step(trainer.state, dbatch, rng)))

    # forward only (train-mode apply, same dropout/missing path as the step)
    from medical_tri_modal_pilot_tpu.train.trainer import compute_missing_num

    def fwd_only(params, b, k):
        mn = compute_missing_num(cfg, b["missing"])
        (logits, _, _), _ = trainer._apply(params, trainer.state.batch_stats,
                                           b, mn, False, k)
        return logits
    fwd = jax.jit(fwd_only)
    _ = fwd(trainer.state.params, dbatch, rng)
    _record("fwd", _windows(lambda: fwd(trainer.state.params, dbatch, rng)))

    # grads only (fwd+bwd, no optimizer)
    def grads_only(params, b, k):
        mn = compute_missing_num(cfg, b["missing"])

        def lf(p):
            (logits, _, _), _ = trainer._apply(p, trainer.state.batch_stats,
                                               b, mn, False, k)
            return jnp.sum(logits.astype(jnp.float32))
        return jax.grad(lf)(params)
    gfn = jax.jit(grads_only)
    g0 = gfn(trainer.state.params, dbatch, rng)
    _record("fwd_bwd", _windows(lambda: gfn(trainer.state.params,
                                            dbatch, rng)))

    # optimizer update alone
    opt = jax.jit(lambda g: trainer.tx.update(g, trainer.state.opt_state,
                                              trainer.state.params))
    _ = opt(g0)
    _record("opt", _windows(lambda: opt(g0)))

    # packed swin trunk alone (the capacity the packed path runs: 33+1 rows)
    from medical_tri_modal_pilot_tpu.models.swin import SwinTransformer
    cap = int(np.ceil(BATCH * 0.5)) + 1
    sw = SwinTransformer(in_channels=1, dtype=jnp.bfloat16)
    img = jnp.asarray(r.normal(0, 1, (cap, 1, 224, 224)), jnp.bfloat16)
    swp = sw.init(jax.random.PRNGKey(1), img, True)
    swf = jax.jit(lambda p, x: sw.apply(p, x, True))
    _ = swf(swp, img)
    _record("swin_packed_fwd", _windows(lambda: swf(swp, img)))

    print({k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in results.items()})


if __name__ == "__main__":
    main()
