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


def timm_epoch_schedule(sched: str, base_lr: float, *, epochs: int,
                        steps_per_epoch: int, min_lr: float = 1e-5,
                        warmup_lr: float = 1e-6, warmup_epochs: int = 5,
                        decay_epochs: float = 30.0,
                        decay_rate: float = 0.1):
    """timm ``create_scheduler`` parity for stage 2.

    The reference drives stage-2 lr with timm (post_train.py:302) stepped
    once per epoch at epoch start (``scheduler.step(epoch)``,
    post_train.py:350), so the lr is constant within an epoch.  Flag
    surface: --sched/--min-lr/--decay-epochs/--decay-rate
    (post_train.py:469-482).  Semantics reproduced from timm's
    CosineLRScheduler (t_initial=epochs, cycle_limit=1,
    warmup_prefix=False) and StepLRScheduler:

      cosine: t < warmup_t  -> warmup_lr + t*(base-warmup_lr)/warmup_t
              t < t_initial -> min_lr + (base-min_lr)/2*(1+cos(pi*t/t_init))
              t >= t_initial-> min_lr          (cycle_limit=1 exhausts)
      step:   t < warmup_t  -> same warmup leg
              else          -> base * decay_rate ** floor(t/decay_epochs)

    Returns a pure fn(step) -> lr with epoch = floor(step/steps_per_epoch).
    """
    if sched not in ("cosine", "step"):
        raise ValueError(f"unsupported --sched {sched!r} "
                         "(cosine|step; others are INERT, see cli/flags.py)")

    def fn(step):
        t = jnp.floor(jnp.asarray(step, jnp.float32)
                      / max(1, steps_per_epoch))
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(1, warmup_epochs)
        if sched == "cosine":
            cos = min_lr + 0.5 * (base_lr - min_lr) * (
                1.0 + jnp.cos(jnp.pi * t / max(1, epochs)))
            main = jnp.where(t >= epochs, min_lr, cos)
        else:
            main = base_lr * decay_rate ** jnp.floor(t / decay_epochs)
        return jnp.where(t < warmup_epochs, warm, main)

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
