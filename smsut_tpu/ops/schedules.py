# -*- coding: utf-8 -*-
"""Learning-rate and rampup schedules as pure functions of the step counter.

The reference mutates optimizer LR *after* each step
(`trainer/unetTrainer.py:82-85`), so step k trains with
poly(max(k-1, 0)); the schedule below reproduces that off-by-one exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def poly_lr_schedule(base_lr: float, total_iters: int, power: float = 0.9):
    """lr * (1 - iter/total)^power applied per-iteration, one step late."""

    def schedule(count):
        eff = jnp.maximum(count - 1, 0).astype(jnp.float32)
        # clamp at 0 past total_iters: a negative base to a fractional
        # power is NaN, which would silently poison the weights if a run
        # ever outlives its schedule (reference runs end exactly at total)
        base = jnp.maximum(1.0 - eff / total_iters, 0.0)
        return base_lr * base ** power

    return schedule


def poly_lr_host(base_lr: float, step: int, total_iters: int,
                 power: float = 0.9) -> float:
    """Host-side mirror of `poly_lr_schedule` for logging (same clamp —
    in Python a negative base ** 0.9 is a *complex* number)."""
    eff = max(int(step) - 1, 0)
    return float(base_lr * max(1.0 - eff / total_iters, 0.0) ** power)


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """exp(-5 (1-t)^2) rampup (`trainer/baseTrainer.py:64-72`). Host-side."""
    if rampup_length == 0:
        return 1.0
    current = np.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def mean_teacher_alpha(iteration: int, ema_decay: float = 0.99) -> float:
    """EMA decay gate: 0 for the first 100 iters then min(1-1/(t+1), decay)
    (`trainer/meanTeacherTrainer.py:63-67`). Host-side."""
    if iteration < 100:
        return 0.0
    return min(1.0 - 1.0 / (iteration + 1), ema_decay)
