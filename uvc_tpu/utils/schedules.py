"""Learning-rate and temperature schedules.

Pure functions step -> multiplier, matching the reference LambdaLR schedules
(UVC/utils/scheduler.py:15-63).  The dual-z staircase lives on
MinimaxHParams.zlr_for_epoch (see compress/state.py), replacing the
mutable PresetLRScheduler (:69-94).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, t_total: int,
                           cycles: float = 0.5):
    """WarmupCosineSchedule (scheduler.py:46-63)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, t_total - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return fn


def warmup_linear_schedule(base_lr: float, warmup_steps: int, t_total: int):
    """WarmupLinearSchedule (scheduler.py:30-43)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        lin = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, lin)

    return fn


def warmup_constant_schedule(base_lr: float, warmup_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        return base_lr * jnp.where(step < warmup_steps, warm, 1.0)

    return fn


def get_tau(tau_max: float, tau_min: float, step, total_steps: int):
    """Token-selection gumbel temperature ramp.

    Reference parity (joint_train.py:83-85, engine.py:24-25):
    ``tau = min + (max - min) * ite / total`` — called with (10, 0.1), so
    tau *rises* 0.1 -> 10 over training (sampling gets softer, not harder).
    """
    frac = jnp.clip(jnp.asarray(step, jnp.float32) / max(1, total_steps),
                    0.0, 1.0)
    return tau_min + (tau_max - tau_min) * frac
