"""Classification + knowledge-distillation losses.

JAX equivalents of the reference loss stack:

* timm SoftTargetCrossEntropy (used with mixup: joint_train.py:938-940);
* timm LabelSmoothingCrossEntropy (:941-942);
* DistillationLoss soft/hard blending (UVC/utils/losses.py:10-65) — soft is
  ``KL(log_softmax(student/T) || log_softmax(teacher/T)) * T^2 / numel``
  with a *sum* reduction divided by the full logits numel (note: numel, not
  batch — mirrored exactly), hard is CE against the teacher argmax.

The teacher forward runs inside the same jitted train step (bf16), so XLA
overlaps student/teacher compute — the reference pays two separate
synchronous forwards (losses.py:47-49).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def soft_target_cross_entropy(logits: jax.Array,
                              target_probs: jax.Array) -> jax.Array:
    """Mean over batch of ``-sum(target * log_softmax(logits))``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_probs * logp, axis=-1))


def label_smoothing_cross_entropy(logits: jax.Array, labels: jax.Array,
                                  smoothing: float = 0.1) -> jax.Array:
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def distillation_loss(base_loss: jax.Array, student_kd_logits: jax.Array,
                      teacher_logits: jax.Array, *,
                      kind: Optional[str], alpha: float,
                      tau: float) -> jax.Array:
    """Blend ``(1-alpha)*base + alpha*distill`` (utils/losses.py:51-64)."""
    if kind is None or kind == "none":
        return base_loss
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    if kind == "soft":
        t = tau
        s_logp = jax.nn.log_softmax(student_kd_logits / t, axis=-1)
        t_logp = jax.nn.log_softmax(teacher_logits / t, axis=-1)
        # kl_div(input=s_logp, target=t_logp, log_target=True, sum)
        kl = jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp))
        distill = kl * (t * t) / student_kd_logits.size
    elif kind == "hard":
        hard_labels = jnp.argmax(teacher_logits, axis=-1)
        logp = jax.nn.log_softmax(student_kd_logits, axis=-1)
        distill = -jnp.mean(
            jnp.take_along_axis(logp, hard_labels[:, None], axis=-1))
    else:
        raise ValueError(f"unknown distillation type {kind!r}")
    return base_loss * (1.0 - alpha) + distill * alpha
