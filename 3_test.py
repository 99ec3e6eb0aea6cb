"""Standalone evaluation driver — reference 3_test.py: walk
{dir_result}/{project}/ckpts/*.pth, rebuild the test loader per checkpoint
(with --image/text-observed-prop modality dropout), load weights, eval, and
aggregate across seeds. (The reference file's eval loop is dead code after
a stray `continue` at 3_test.py:140 — this implements the evident intent.)"""
from __future__ import annotations

import os
import random
import sys

# Honor JAX_PLATFORMS programmatically — the axon TPU plugin registers its
# backend regardless of the environment variable (see 2_train.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# persistent XLA compile cache (see 2_train.py; GRAFT_COMPILE_CACHE=0
# disables — the env-var route is ignored by this jax build)
from medical_tri_modal_pilot_tpu.utils.compile_cache import \
    enable_compile_cache
enable_compile_cache()

import numpy as np

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.pipeline import get_test_data_loader
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.checkpoints import (
    load_checkpoint_any, restore_into_state)
from medical_tri_modal_pilot_tpu.train.logger import Logger, ResultsAggregator
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


def search_ckpts(root: str):
    found = []
    for path, dirs, files in os.walk(root):
        for fn in files:
            if fn.endswith(".pth"):
                found.append(os.path.join(path, fn))
        for dn in dirs:
            if dn.endswith(".pth.orbax"):   # orbax backend directories
                found.append(os.path.join(path, dn[:-len(".orbax")]))
    return sorted(set(found))


def main() -> None:
    cfg = parse_config()
    from medical_tri_modal_pilot_tpu.parallel.distributed import \
        maybe_init_distributed
    maybe_init_distributed(cfg)
    ckpt_dir = os.path.join(cfg.dir_result, cfg.project_name, "ckpts")
    ckpts = [p for p in search_ckpts(ckpt_dir)
             if ("best" in os.path.basename(p) if cfg.best and not cfg.last
                 else True)]
    # multi-host: checkpoint discovery is per-process against the local
    # fs. All processes must agree on the walk result before any of them
    # enters (or skips) the jitted eval collectives — a host that exits
    # while others proceed wedges the distributed job.
    from medical_tri_modal_pilot_tpu.parallel.distributed import \
        assert_agreement
    assert_agreement("3_test checkpoint count", len(ckpts))
    if not ckpts:
        print(f"no checkpoints under {ckpt_dir}")
        sys.exit(1)

    agg = ResultsAggregator("test (all ckpts)")
    trainer = None   # built once (eval-only: no optimizer state, no
    #                  train-step compile) and reused across the ckpt walk
    cached_loader = None   # per-checkpoint rebuilds assemble identical
    #                        deterministic batches (same seed, cached
    #                        index/window dicts) — replay them from RAM
    for k_indx, path in enumerate(ckpts):
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)
        logger = Logger(cfg, fold=k_indx)
        if cached_loader is None:
            test_loader = get_test_data_loader(cfg)
            from medical_tri_modal_pilot_tpu.data.pipeline import \
                maybe_replay
            # no-op when --*-observed-prop dropout makes passes
            # non-deterministic (each checkpoint walk must redraw)
            test_loader = maybe_replay(test_loader, cfg)
            cached_loader = test_loader
        test_loader = cached_loader
        if len(test_loader) == 0:
            print("empty test loader")
            continue
        if trainer is None:
            model = get_model(cfg)
            from medical_tri_modal_pilot_tpu.data.txt_table import \
                build_txt_table
            txt_table = build_txt_table(cfg, (test_loader.dataset,))
            sample_batch = next(iter(test_loader))
            trainer = Trainer(cfg, model, 1, sample_batch, seed=cfg.seed,
                              eval_only=True, txt_table=txt_table)
        payload = load_checkpoint_any(cfg.ckpt_backend, path)
        # same-file check across hosts (loads are per-process)
        assert_agreement(f"ckpt {k_indx} step", int(payload.get("step", 0)))
        trainer.state = restore_into_state(trainer.state, payload,
                                           with_optimizer=False)
        logger.evaluator.reset()
        # eval order is irrelevant (targets travel in the batch) — sort
        # pooled batches by TIE length to hit the small --tie-buckets
        # programs (see --eval-length-rebatch)
        from medical_tri_modal_pilot_tpu.data.pipeline import length_rebatch
        for batch in length_rebatch(test_loader, cfg.eval_length_rebatch):
            probs, _loss, rmse = trainer.eval_step(batch)
            logger.evaluator.add_batch(batch["target"], probs, rmse=rmse)
        print(f"ckpt: {path}")
        agg.add(logger.test_result_only())
        logger.close()
    agg.summarize()


if __name__ == "__main__":
    main()
