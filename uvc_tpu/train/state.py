"""Train state and training hyperparameters."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uvc_tpu.compress.state import CompressionState
from uvc_tpu.utils.schedules import (warmup_cosine_schedule,
                                     warmup_linear_schedule)


@dataclasses.dataclass(frozen=True)
class TrainHParams:
    """Weight-training hyperparameters (CLI parity: joint_train.py:708-746,
    784-806)."""

    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    max_grad_norm: float = 1.0
    warmup_steps: int = 500
    t_total: int = 10000
    decay_type: str = "cosine"          # cosine | linear
    num_epochs: int = 20
    warmup_epochs: int = 5              # UVC gating warmup (epochs)
    warmup_lr: float = 1e-4
    # mixup family
    mixup: float = 0.8
    cutmix: float = 1.0
    mixup_prob: float = 0.8
    mixup_switch_prob: float = 0.5
    mixup_mode: str = "batch"            # batch | elem | pair
    cutmix_minmax: object = None         # optional (min, max) box fractions
    smoothing: float = 0.1
    num_classes: int = 1000
    # distillation
    distillation_type: Optional[str] = "soft"   # none | soft | hard
    distillation_alpha: float = 0.5
    distillation_tau: float = 1.0
    # gradient accumulation: micro-steps accumulate loss/N grads, every
    # N-th step applies clip + AdamW + the arch update
    # (joint_train.py:414-424, post_train.py:641-649)
    accum_steps: int = 1
    # stage-2 timm scheduler surface (post_train.py:302, :350, :469-482):
    # when ``sched`` is set ("cosine"|"step") the lr follows the per-epoch
    # timm schedule instead of the per-step warmup-cosine/linear
    sched: Optional[str] = None
    min_lr: float = 1e-5
    sched_warmup_lr: float = 1e-6        # timm --warmup-lr default
    decay_epochs: float = 30.0
    decay_rate: float = 0.1
    steps_per_epoch: int = 0             # epoch granularity for ``sched``
    # stage-2 timm create_optimizer surface (post_train.py:455-466)
    opt: str = "adamw"                   # adamw | sgd | momentum
    opt_eps: float = 1e-8
    opt_betas: object = None             # optional (b1, b2)
    momentum: float = 0.9
    # numerics
    compute_dtype: Any = jnp.bfloat16

    def lr_schedule(self):
        if self.sched:
            from uvc_tpu.utils.schedules import timm_epoch_schedule
            return timm_epoch_schedule(
                self.sched, self.learning_rate, epochs=self.num_epochs,
                steps_per_epoch=self.steps_per_epoch, min_lr=self.min_lr,
                warmup_lr=self.sched_warmup_lr,
                warmup_epochs=self.warmup_epochs,
                decay_epochs=self.decay_epochs,
                decay_rate=self.decay_rate)
        if self.decay_type == "cosine":
            return warmup_cosine_schedule(self.learning_rate,
                                          self.warmup_steps, self.t_total)
        return warmup_linear_schedule(self.learning_rate, self.warmup_steps,
                                      self.t_total)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    cstate: Optional[CompressionState] = None
    # gradient-accumulation buffer (params-shaped; None when accum_steps==1)
    grad_accum: Any = None


def make_weight_optimizer(thp: TrainHParams,
                          lr_fn=None) -> optax.GradientTransformation:
    """AdamW with the warmup-cosine/linear schedule.

    Torch parity: AdamW(lr, wd=0.05) over *all* parameters (including
    norms/biases/tokens — torch applies decoupled wd uniformly:
    joint_train.py:271).  Global-norm clipping happens in the train step
    *before* this transform so the clipped gating gradient can also feed the
    minimax update, matching the reference ordering (clip at
    joint_train.py:428, gating grad read at uvc_optimizer.py:90).

    ``lr_fn`` overrides the schedule (must be a callable so the optax
    state structure stays identical across phase variants) — used for the
    constant ``warmup_lr`` during UVC warmup epochs (joint_train.py:351).

    ``thp.opt`` selects the optimizer family, mirroring stage-2's timm
    create_optimizer surface (post_train.py:455-466): adamw (default),
    or sgd/momentum (heavyball SGD with coupled weight decay, the timm
    'momentum'/'sgd' variants — timm sgd uses nesterov, momentum not).
    """
    lr = lr_fn or thp.lr_schedule()
    if thp.opt in ("sgd", "momentum"):
        return optax.chain(
            optax.add_decayed_weights(thp.weight_decay),
            optax.sgd(lr, momentum=thp.momentum,
                      nesterov=thp.opt == "sgd"))
    b1, b2 = thp.opt_betas or (0.9, 0.999)
    return optax.adamw(lr, b1=b1, b2=b2, eps=thp.opt_eps,
                       weight_decay=thp.weight_decay)


def zero_frozen_updates(updates):
    """Zero optimizer updates for non-trainable leaves (the performer's
    ``prm_w`` random-feature matrix: requires_grad=False in the reference,
    token_performer.py:28-29).  Its gradient is already zero via
    stop_gradient, but decoupled weight decay would still shrink it."""
    def z(path, u):
        if "prm_w" in jax.tree_util.keystr(path):
            return jnp.zeros_like(u)
        return u

    return jax.tree_util.tree_map_with_path(z, updates)


def clip_global_norm(grads, max_norm: float):
    """torch clip_grad_norm_ semantics: scale all grads by
    max_norm/total_norm when total exceeds max_norm."""
    total = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), total


def create_train_state(params, thp: TrainHParams,
                       cstate: Optional[CompressionState] = None
                       ) -> TrainState:
    tx = make_weight_optimizer(thp)
    grad_accum = None
    if thp.accum_steps > 1:
        grad_accum = jax.tree.map(jnp.zeros_like, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), cstate=cstate,
                      grad_accum=grad_accum)
