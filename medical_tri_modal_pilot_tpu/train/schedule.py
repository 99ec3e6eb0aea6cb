"""LR schedules as pure step->lr functions (optax-compatible).

``cosine_annealing_warmup_restarts`` mirrors the reference scheduler
(builder/utils/cosine_annealing_with_warmup_v2.py:56-92, called with
epoch=iteration so the closed-form branch of step() applies): linear warmup
from min_lr to max_lr*gamma^cycle, then cosine to min_lr, cycles growing by
cycle_mult.

``cosine_warmup_single`` is the OneCycle-style single-cycle variant
(cosine_annealing_with_warmupSingle.py): linear ramp for warmup then a
single cosine decay over the remaining steps.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_annealing_warmup_restarts(first_cycle_steps: int,
                                     max_lr: float,
                                     min_lr: float = 1e-6,
                                     warmup_steps: int = 0,
                                     gamma: float = 1.0,
                                     cycle_mult: float = 1.0):
    """Returns f(step) -> lr. Matches the reference's explicit-epoch stepping
    (scheduler.step(iteration), 2_train.py:190 — iteration starts at 1)."""
    assert warmup_steps < first_cycle_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            step_in_cycle = step - cycle * first_cycle_steps
            cur_cycle_steps = jnp.float32(first_cycle_steps)
        else:
            ratio = step / first_cycle_steps * (cycle_mult - 1.0) + 1.0
            cycle = jnp.floor(jnp.log(jnp.maximum(ratio, 1.0))
                              / math.log(cycle_mult))
            start = first_cycle_steps * (cycle_mult ** cycle - 1.0) / (cycle_mult - 1.0)
            step_in_cycle = step - jnp.floor(start)
            cur_cycle_steps = first_cycle_steps * cycle_mult ** cycle
        cur_max_lr = max_lr * gamma ** cycle
        warm = (cur_max_lr - min_lr) * step_in_cycle / warmup_steps + min_lr \
            if warmup_steps > 0 else jnp.float32(cur_max_lr)
        denom = jnp.maximum(cur_cycle_steps - warmup_steps, 1.0)
        cos = min_lr + (cur_max_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (step_in_cycle - warmup_steps) / denom)) / 2.0
        return jnp.where(step_in_cycle < warmup_steps, warm, cos)

    return schedule


def cosine_warmup_single(total_steps: int, max_lr: float,
                         min_lr: float = 1e-6, warmup_steps: int = 0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = max_lr * step / jnp.maximum(warmup_steps, 1)
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        cos = min_lr + (max_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (step - warmup_steps) / denom)) / 2.0
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
