"""Gradual magnitude pruning (GMP) schedule.

Reference: train_one_epoch_GMP (Baseline_pruning/engine.py:88-141) with the
cubic sparsity ramp ``get_sparsity`` (engine.py:24-27, Zhu & Gupta 2017):
after ``t_start`` steps, every ``delta_t`` steps re-score by magnitude and
re-threshold globally at

    sparsity(t) = s_end + (s_start - s_end) * (1 - (t - t_0)/(n*dt))^3

for at most ``pruning_times`` pruning events.
"""

from __future__ import annotations

import dataclasses

from uvc_tpu.baselines.pruning import (global_threshold_mask,
                                       magnitude_scores)


def cubic_sparsity(s_start: float, s_end: float, t: int, t_0: int,
                   pruning_times: int, delta_t: int) -> float:
    """engine.py:24-27 math, with the ramp clamped at its endpoint so
    steps past the schedule end hold s_end instead of overshooting (the
    reference never runs past the end; a resumed run can)."""
    frac = min(max((t - t_0) / (pruning_times * delta_t), 0.0), 1.0)
    coef = (1 - frac) ** 3
    return s_end + (s_start - s_end) * coef


@dataclasses.dataclass
class GMPSchedule:
    """Host-side GMP controller: call ``maybe_prune`` once per step."""

    sparsity: float            # final target sparsity (fraction removed)
    t_start: int               # first step eligible for pruning
    delta_t: int               # steps between pruning events
    pruning_times: int         # max number of pruning events
    events: int = 0

    def should_prune(self, step: int) -> bool:
        """engine.py:133-135 trigger condition."""
        return (step > self.t_start
                and (step - self.t_start) % self.delta_t == 0
                and self.events < self.pruning_times)

    def maybe_prune(self, step: int, params):
        """Returns new masks (or None if this step is not a pruning event).

        Magnitude scoring + global threshold at the cubic-schedule density
        (engine.py:136-141: ``pruner.mask(1 - sparsity, 'global')``).
        """
        if not self.should_prune(step):
            return None
        sp = cubic_sparsity(0.0, self.sparsity, step, self.t_start,
                            self.pruning_times, self.delta_t)
        self.events += 1
        return global_threshold_mask(magnitude_scores(params), 1.0 - sp)
