"""On-device mixup / cutmix with smoothed soft targets.

The reference uses timm's host-side ``Mixup`` (joint_train.py:929-933,
defaults mixup=.8, cutmix=1.0, prob=.8, switch_prob=.5, mode='batch',
smoothing=.1).  Here augmentation runs inside the jitted train step on
device — static shapes, fused with the forward, no host<->device traffic.

'batch' mode semantics (the reference default): one lambda per batch,
partner is the flipped batch; with probability ``switch_prob`` a cutmix box
replaces the element-wise blend; with probability ``1 - prob`` the batch is
left unmixed (lam=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jax.Array, num_classes: int,
                   smoothing: float = 0.1) -> jax.Array:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _cutmix_mask(key: jax.Array, h: int, w: int, lam: jax.Array) -> jax.Array:
    """[H, W] 0/1 mask where 1 = take from the partner image; box area
    approximates (1-lam)."""
    ky, kx = jax.random.split(key)
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    return box, y0, y1, x0, x1


def mixup_cutmix(key: jax.Array, x: jax.Array, labels: jax.Array, *,
                 num_classes: int, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, prob: float = 0.8,
                 switch_prob: float = 0.5, smoothing: float = 0.1):
    """Returns (mixed_x [B,H,W,C], soft_targets [B,classes])."""
    k_apply, k_switch, k_mix, k_cut, k_box = jax.random.split(key, 5)
    b, h, w, _ = x.shape

    apply_mix = jax.random.uniform(k_apply) < prob
    use_cutmix = (cutmix_alpha > 0) & (jax.random.uniform(k_switch)
                                       < switch_prob)
    if mixup_alpha <= 0:
        use_cutmix = jnp.asarray(True)

    lam_mix = jax.random.beta(k_mix, mixup_alpha, mixup_alpha) \
        if mixup_alpha > 0 else jnp.asarray(1.0)
    lam_cut = jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha) \
        if cutmix_alpha > 0 else jnp.asarray(1.0)

    x_flip = x[::-1]
    # element-wise mixup
    x_mixup = lam_mix * x + (1.0 - lam_mix) * x_flip
    # cutmix box
    box, y0, y1, x0, x1 = _cutmix_mask(k_box, h, w, lam_cut)
    x_cutmix = jnp.where(box[None, :, :, None], x_flip, x)
    # correct lam by the realized box area (timm cutmix semantics)
    area = ((y1 - y0) * (x1 - x0)).astype(x.dtype)
    lam_cut_real = 1.0 - area / (h * w)

    x_out = jnp.where(use_cutmix, x_cutmix, x_mixup)
    lam = jnp.where(use_cutmix, lam_cut_real, lam_mix)

    x_out = jnp.where(apply_mix, x_out, x)
    lam = jnp.where(apply_mix, lam, 1.0)

    t1 = one_hot_smooth(labels, num_classes, smoothing)
    t2 = t1[::-1]
    targets = lam * t1 + (1.0 - lam) * t2
    return x_out, targets
