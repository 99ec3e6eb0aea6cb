"""Training driver — same CLI surface and flow as the reference 2_train.py
(seeds -> settings file -> patient split -> per-seed {loaders, model,
optimizer+cosine schedule, epoch loop with per-epoch validation, best-ckpt
save, final test with the best checkpoint}), running on TPU via jitted
data-parallel step functions."""
from __future__ import annotations

import os
import random
import sys
import time

# Honor JAX_PLATFORMS programmatically: the axon TPU plugin registers its
# backend regardless of the environment variable, so `JAX_PLATFORMS=cpu
# python 2_train.py ...` (the documented way to force CPU — subprocess
# tests rely on it) silently landed on the tunneled TPU without this.
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent XLA compile cache: the flagship step compile measured ~190 s
# (up to ~1000 s under tunnel load) and recurs on every fresh process
# without this. NOTE: this jax build ignores the JAX_COMPILATION_CACHE_DIR
# env var — only the config API takes effect (utils/compile_cache.py);
# GRAFT_COMPILE_CACHE=0 disables.
from medical_tri_modal_pilot_tpu.utils.compile_cache import \
    enable_compile_cache
enable_compile_cache()

import numpy as np

from medical_tri_modal_pilot_tpu.config import parse_config
from medical_tri_modal_pilot_tpu.data.indexer import patient_wise_ordering
from medical_tri_modal_pilot_tpu.data.pipeline import get_data_loaders
from medical_tri_modal_pilot_tpu.models import get_model
from medical_tri_modal_pilot_tpu.train.checkpoints import (
    AsyncCheckpointer, ckpt_exists, ckpt_path, load_checkpoint_any,
    restore_into_state)
from medical_tri_modal_pilot_tpu.train.logger import (Logger,
                                                      ResultsAggregator,
                                                      make_setting_file)
from medical_tri_modal_pilot_tpu.train.trainer import Trainer


def set_seeds(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def run_eval(trainer, loader, logger) -> float:
    logger.evaluator.reset()
    total_loss, n = 0.0, 0
    from medical_tri_modal_pilot_tpu.data.pipeline import (device_prefetch,
                                                           length_rebatch)
    # eval sample order is irrelevant (per-sample probs+targets travel in
    # the batch; equal-size batches keep the loss mean exact), so sort
    # pooled batches by TIE length to hit the small --tie-buckets programs
    host_iter = length_rebatch(loader,
                               trainer.cfg.eval_length_rebatch)
    targets = []

    def put(b):
        targets.append(b["target"])
        return trainer._device_batch(b)

    for dbatch in device_prefetch(host_iter, put):
        probs, loss, rmse = trainer.eval_step(dbatch, on_device=True)
        logger.evaluator.add_batch(targets[n], probs, rmse=rmse)
        total_loss += loss
        n += 1
    return total_loss / max(n, 1)


def main() -> None:
    cfg = parse_config()
    # multi-host rendezvous must precede any jax backend work; after this
    # jax.devices() is the global list and the mesh spans all hosts
    from medical_tri_modal_pilot_tpu.parallel.distributed import \
        maybe_init_distributed
    pidx, pcnt = maybe_init_distributed(cfg)
    if pcnt > 1:
        print(f"[dist] process {pidx}/{pcnt} initialized "
              f"(coordinator {cfg.dist_coordinator})")
    make_setting_file(cfg)
    if cfg.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    if cfg.profile_dir:
        # jax.profiler trace of the first steps (SURVEY.md §5: the reference
        # has no profiler hooks; this is the TPU-native equivalent)
        import jax
        jax.profiler.start_trace(cfg.profile_dir)

    save_valid = ResultsAggregator("validation (all seeds)")
    save_test = ResultsAggregator("test (all seeds)")

    patient_dict, keys_list = patient_wise_ordering(cfg)
    print("Selected Dataset: ", cfg.train_data_path.split("/")[-2])

    for k_indx, seed_num in enumerate(cfg.seed_list):
        seed_cfg = cfg.replace(seed=seed_num if cfg.cross_fold_val != 1 else cfg.seed,
                               log_fold=k_indx)
        set_seeds(seed_cfg.seed)
        logger = Logger(seed_cfg, fold=k_indx, seed=seed_cfg.seed)

        print("########## Experiment Begins ##########")
        print(seed_cfg.input_types, seed_cfg.modality_inclusion, seed_cfg.model)

        train_loader, val_loader, test_loader = get_data_loaders(
            seed_cfg, patient_dict, keys_list, k_indx)
        # validation runs every epoch over identical deterministic batches —
        # replay them from RAM after the first pass (no-op when
        # --*-observed-prop dropout makes passes non-deterministic)
        from medical_tri_modal_pilot_tpu.data.pipeline import maybe_replay
        val_loader = maybe_replay(val_loader, seed_cfg)
        iters_per_epoch = len(train_loader)
        print("# of Iterations (per epoch): ", iters_per_epoch)
        if iters_per_epoch == 0:
            print("empty train loader — reduce batch size or add data")
            continue

        if seed_cfg.img_pack_frac < 0:
            # resolve the auto packed-swin capacity from the train sampler
            # distribution (data-driven static shape; overflow batches fall
            # back in-graph to the full trunk)
            from medical_tri_modal_pilot_tpu.data.pipeline import \
                auto_img_pack_frac
            seed_cfg = seed_cfg.replace(
                img_pack_frac=auto_img_pack_frac(train_loader))
            print("auto img-pack capacity fraction: "
                  f"{seed_cfg.img_pack_frac:.3f}")
        model = get_model(seed_cfg)
        # device-resident BioBERT table: unique note embeddings ship to
        # HBM once; batches carry int32 row ids (data/txt_table.py) — the
        # 25 MB/batch dense text payload leaves the per-step H2D path
        from medical_tri_modal_pilot_tpu.data.txt_table import \
            build_txt_table
        t_tab = time.time()
        txt_table = build_txt_table(
            seed_cfg, (train_loader.dataset, val_loader.dataset,
                       test_loader.dataset))
        if txt_table is not None:
            print(f"txt device table: {len(txt_table.lengths)} rows, "
                  f"{txt_table.nbytes / 2**20:.0f} MB "
                  f"({time.time() - t_tab:.1f}s build)", flush=True)
        sample_batch = next(iter(train_loader))
        trainer = Trainer(seed_cfg, model, iters_per_epoch, sample_batch,
                          seed=seed_cfg.seed, txt_table=txt_table)

        start_epoch = 1
        iteration = 0
        resume = getattr(seed_cfg, "resume", "none")
        restore_path = None
        if resume == "auto":
            # crash recovery without operator flags (SURVEY §5): restore the
            # newest checkpoint for this fold/seed — 'last' carries the
            # step-granular async saves, 'best' the per-eval promotions;
            # newest by optimizer step wins
            cands = []
            for kind in ("last", "best"):
                p = ckpt_path(seed_cfg.dir_result, seed_cfg.project_name,
                              kind, k_indx, seed_cfg.seed)
                if ckpt_exists(p):
                    pay = load_checkpoint_any(seed_cfg.ckpt_backend, p)
                    cands.append((int(pay.get("step", 0)), p, pay))
            if cands:
                _, restore_path, payload = max(cands, key=lambda c: c[0])
        elif resume in ("best", "last") or seed_cfg.checkpoint:
            kind = resume if resume in ("best", "last") else \
                ("last" if seed_cfg.last else "best")
            p = ckpt_path(seed_cfg.dir_result, seed_cfg.project_name, kind,
                          k_indx, seed_cfg.seed)
            if ckpt_exists(p):
                payload = load_checkpoint_any(seed_cfg.ckpt_backend, p)
                restore_path = p
        # multi-host: restore happens per-process against the local fs —
        # verify every process found the same checkpoint (by step) before
        # stepping, else params would silently diverge inside SPMD
        from medical_tri_modal_pilot_tpu.parallel.distributed import (
            assert_agreement, barrier)
        assert_agreement(
            "resume checkpoint step",
            -1 if restore_path is None else int(payload.get("step", 0)))
        if restore_path is not None:
            trainer.state = restore_into_state(trainer.state, payload)
            logger.best_auc = payload["score"]
            logger.best_score = payload["score"]
            logger.mark_restored()
            start_epoch = payload["epoch"]
            iteration = int(payload.get("last_step", 0))
            print(f"resumed from {restore_path} "
                  f"(epoch {start_epoch}, iteration {iteration})")
        t_start = time.time()
        async_ckpt = AsyncCheckpointer()
        step_ckpt_path = ckpt_path(seed_cfg.dir_result,
                                   seed_cfg.project_name, "last",
                                   k_indx, seed_cfg.seed)

        # K optimizer steps per device dispatch (lax.scan super-batches,
        # trainer.train_multi): amortizes the host->device dispatch latency,
        # which is significant behind the tunneled TPU backend. 0 = auto.
        multi_k = seed_cfg.train_multi_k
        if multi_k == 0:
            import jax
            multi_k = (4 if (seed_cfg.vslt_type in ("TIE", "QIE")
                             and jax.default_backend() == "tpu") else 1)

        t_acc = {"wait": 0.0, "stack": 0.0, "step": 0.0}   # GRAFT_TIME_PHASES

        pending_losses = []   # one-dispatch-deep pipeline (see run_steps)

        def drain_losses(losses_dev, epoch):
            """Materialize one dispatch's device losses and run the
            per-iteration bookkeeping. The blocking float() lives HERE,
            one dispatch behind the enqueue, so the next super-batch's
            host->device transfer overlaps the current dispatch's compute
            (both device_put and the jitted call are asynchronous)."""
            nonlocal iteration
            t0 = time.time()
            for loss_f in [float(x) for x in np.asarray(losses_dev)]:
                iteration += 1
                if seed_cfg.profile_dir and iteration == 10:
                    import jax
                    jax.profiler.stop_trace()
                if iteration % seed_cfg.log_iter == 0:
                    logger.log_train(loss_f, trainer.current_lr(), iteration)
                if (seed_cfg.checkpoint_every > 0
                        and iteration % seed_cfg.checkpoint_every == 0):
                    # step-granular async save for crash recovery
                    # (resume with --checkpoint --last)
                    async_ckpt.save(step_ckpt_path, trainer.state,
                                    logger.best_score, epoch,
                                    logger.best_iter, iteration)
            t_acc["step"] += time.time() - t0

        def run_steps(batches, epoch):
            """Enqueue one dispatch for len(batches) optimizer steps. Tail
            chunks (< multi_k) take single steps so train_multi compiles
            for exactly one K. Losses drain one dispatch later."""
            t0 = time.time()
            if len(batches) > 1:
                batches = trainer.wire_pack_many(batches)
                stacked = {key: np.stack([b[key] for b in batches])
                           for key in batches[0]}
                t_acc["stack"] += time.time() - t0
                losses_dev = trainer.train_multi(stacked)
            else:
                losses_dev = [trainer.train_step(batches[0])]
            pending_losses.append((losses_dev, epoch))
            while len(pending_losses) > 1:
                drain_losses(*pending_losses.pop(0))

        def flush_steps():
            while pending_losses:
                drain_losses(*pending_losses.pop(0))

        from medical_tri_modal_pilot_tpu.data.pipeline import length_rebatch
        for epoch in range(start_epoch, seed_cfg.epochs + 1):
            t_epoch0 = time.time()   # GRAFT_TIME_PHASES epoch breakdown
            # --length-rebatch: sort pooled samples by TIE length so the
            # --tie-buckets prefix batches compile/run at short lengths
            epoch_iter = length_rebatch(train_loader,
                                        seed_cfg.length_rebatch)
            if multi_k > 1:
                pending = []
                it = iter(epoch_iter)
                while True:
                    t0 = time.time()
                    batch = next(it, None)
                    t_acc["wait"] += time.time() - t0
                    if batch is None:
                        break
                    pending.append(batch)
                    if len(pending) == multi_k:
                        run_steps(pending, epoch)
                        pending = []
                while pending:   # epoch tail: single steps
                    run_steps(pending[:1], epoch)
                    pending = pending[1:]
            else:
                for batch in trainer.prefetch(epoch_iter):
                    loss = trainer.train_step(batch, on_device=True)
                    run_steps_log = float(loss)
                    iteration += 1
                    if seed_cfg.profile_dir and iteration == 10:
                        import jax
                        jax.profiler.stop_trace()
                    if iteration % seed_cfg.log_iter == 0:
                        logger.log_train(run_steps_log, trainer.current_lr(),
                                         iteration)
                    if (seed_cfg.checkpoint_every > 0
                            and iteration % seed_cfg.checkpoint_every == 0):
                        async_ckpt.save(step_ckpt_path, trainer.state,
                                        logger.best_score, epoch,
                                        logger.best_iter, iteration)
            # join the one-dispatch loss pipeline before validation uses
            # the iteration counter (and before the epoch save records it)
            flush_steps()
            # per-epoch validation (2_train.py:213-287)
            t_phase = time.time()
            if len(val_loader) > 0:
                val_loss = run_eval(trainer, val_loader, logger)
                logger.add_validation_logs(iteration, val_loss)
            t_val = time.time()
            async_ckpt.wait()   # don't race the epoch-level 'last' save
            logger.save(trainer.state, iteration, epoch)   # async write
            # keep processes in step once per epoch (the write itself is
            # ordered before any restore by the wait_saves barrier below)
            barrier(f"epoch {epoch} save")
            t_save = time.time()
            dt = time.time() - t_start
            # flush: bench's e2e stage parses this line from a subprocess
            # pipe, possibly after killing the run mid-epoch — a buffered
            # line would vanish with the process
            print(f"epoch {epoch}/{seed_cfg.epochs} done "
                  f"({iteration} iters, {dt:.1f}s elapsed)", flush=True)
            if os.environ.get("GRAFT_TIME_PHASES"):
                print(f"  [phases] train={t_phase - t_epoch0:.1f}s "
                      f"val={t_val - t_phase:.1f}s "
                      f"save={t_save - t_val:.1f}s "
                      f"(wait={t_acc['wait']:.1f}s stack={t_acc['stack']:.1f}s "
                      f"step={t_acc['step']:.1f}s)", flush=True)
                t_acc.update(wait=0.0, stack=0.0, step=0.0)

        save_valid.add(logger.val_results)

        # final test with the best checkpoint (2_train.py:298-384)
        kind = "last" if seed_cfg.last and not seed_cfg.best else "best"
        path = ckpt_path(seed_cfg.dir_result, seed_cfg.project_name, kind,
                         k_indx, seed_cfg.seed)
        # join the async epoch saves, then order process 0's writes before
        # any restore read. Every process must load the same best state (or
        # none): without a shared results dir, non-primary hosts would keep
        # their last training params while process 0 loads 'best' — silently
        # wrong final test metrics under SPMD; assert_agreement verifies the
        # restore decision agrees.
        logger.wait_saves()
        barrier("final saves complete")
        payload = (load_checkpoint_any(seed_cfg.ckpt_backend, path)
                   if ckpt_exists(path) else None)
        assert_agreement(
            f"final {kind} checkpoint step",
            -1 if payload is None else int(payload.get("step", 0)))
        if payload is not None:
            trainer.state = restore_into_state(trainer.state, payload,
                                               with_optimizer=False)
        if len(test_loader) > 0:
            run_eval(trainer, test_loader, logger)
            save_test.add(logger.test_result_only())
        logger.close()

    save_valid.summarize()
    save_test.summarize()


if __name__ == "__main__":
    main()
