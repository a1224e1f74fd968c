"""On-device mixup / cutmix with smoothed soft targets.

The reference uses timm's host-side ``Mixup`` (joint_train.py:929-933,
defaults mixup=.8, cutmix=1.0, prob=.8, switch_prob=.5, mode='batch',
smoothing=.1).  Here augmentation runs inside the jitted train step on
device — static shapes, fused with the forward, no host<->device traffic.

Modes (timm parity):
  'batch' (reference default): one lambda per batch, partner = flipped
          batch; switch_prob chooses cutmix over the element blend;
          with prob 1-prob the batch is left unmixed.
  'elem':  independent lambda / cutmix decision / box per sample.
  'pair':  like elem but sample i and its partner b-1-i share one lambda
           and one decision (timm Mixup._mix_pair).
``cutmix_minmax`` overrides the beta-derived box with uniformly sampled
box sides in [min, max] fraction of H/W (timm rand_bbox_minmax; timm pins
cutmix_alpha to 1.0 when set, but the mixup/cutmix switch still applies).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jax.Array, num_classes: int,
                   smoothing: float = 0.1) -> jax.Array:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _box_from_lam(key: jax.Array, h: int, w: int, lam: jax.Array):
    """timm rand_bbox: box side ratio sqrt(1-lam), random center."""
    ky, kx = jax.random.split(key)
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    return (jnp.clip(cy - cut_h // 2, 0, h), jnp.clip(cy + cut_h // 2, 0, h),
            jnp.clip(cx - cut_w // 2, 0, w), jnp.clip(cx + cut_w // 2, 0, w))


def _box_from_minmax(key: jax.Array, h: int, w: int,
                     minmax: Sequence[float]):
    """timm rand_bbox_minmax: sides uniform in [min, max] fraction."""
    kh, kw, ky, kx = jax.random.split(key, 4)
    lo, hi = float(minmax[0]), float(minmax[1])
    cut_h = jax.random.randint(kh, (), int(h * lo), max(int(h * hi), int(h * lo) + 1))
    cut_w = jax.random.randint(kw, (), int(w * lo), max(int(w * hi), int(w * lo) + 1))
    y0 = jax.random.randint(ky, (), 0, h - cut_h + 1)
    x0 = jax.random.randint(kx, (), 0, w - cut_w + 1)
    return y0, y0 + cut_h, x0, x0 + cut_w


def _box_mask(h: int, w: int, y0, y1, x0, x1):
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))


def _sample_one(key, h: int, w: int, mixup_alpha, cutmix_alpha, prob,
                switch_prob, cutmix_minmax):
    """Draw (lam, use_cutmix, box mask) for one mixing decision."""
    k_apply, k_switch, k_mix, k_cut, k_box = jax.random.split(key, 5)
    apply_mix = jax.random.uniform(k_apply) < prob
    # timm: cutmix_minmax pins cutmix_alpha to 1.0 (Mixup.__init__) but the
    # mixup/cutmix switch still happens via switch_prob
    cutmix_on = (cutmix_alpha > 0) or (cutmix_minmax is not None)
    if mixup_alpha <= 0:
        use_cutmix = jnp.asarray(True)
    elif not cutmix_on:
        use_cutmix = jnp.asarray(False)
    else:
        use_cutmix = jax.random.uniform(k_switch) < switch_prob
    lam_mix = jax.random.beta(k_mix, mixup_alpha, mixup_alpha) \
        if mixup_alpha > 0 else jnp.asarray(1.0)
    if cutmix_minmax is not None:
        y0, y1, x0, x1 = _box_from_minmax(k_box, h, w, cutmix_minmax)
    else:
        lam_cut = jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha) \
            if cutmix_alpha > 0 else jnp.asarray(1.0)
        y0, y1, x0, x1 = _box_from_lam(k_box, h, w, lam_cut)
    box = _box_mask(h, w, y0, y1, x0, x1)
    area = ((y1 - y0) * (x1 - x0)).astype(jnp.float32)
    lam_cut_real = 1.0 - area / (h * w)
    lam = jnp.where(use_cutmix, lam_cut_real, lam_mix)
    lam = jnp.where(apply_mix, lam, 1.0)
    box = box & apply_mix & use_cutmix
    # when cutmix is off for this decision, the blend path handles mixing
    use_blend = apply_mix & ~use_cutmix
    return lam.astype(jnp.float32), use_blend, box


def mixup_cutmix(key: jax.Array, x: jax.Array, labels: jax.Array, *,
                 num_classes: int, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, prob: float = 0.8,
                 switch_prob: float = 0.5, smoothing: float = 0.1,
                 mode: str = "batch",
                 cutmix_minmax: Optional[Sequence[float]] = None):
    """Returns (mixed_x [B,H,W,C], soft_targets [B,classes])."""
    b, h, w, _ = x.shape
    x_flip = x[::-1]
    t1 = one_hot_smooth(labels, num_classes, smoothing)
    t2 = t1[::-1]

    if mode == "batch":
        lam, use_blend, box = _sample_one(
            key, h, w, mixup_alpha, cutmix_alpha, prob, switch_prob,
            cutmix_minmax)
        x_out = jnp.where(box[None, :, :, None], x_flip, x)
        x_out = jnp.where(use_blend,
                          lam * x + (1.0 - lam) * x_flip, x_out)
        targets = lam * t1 + (1.0 - lam) * t2
        return x_out.astype(x.dtype), targets

    keys = jax.random.split(key, b)
    lam, use_blend, box = jax.vmap(
        lambda k: _sample_one(k, h, w, mixup_alpha, cutmix_alpha, prob,
                              switch_prob, cutmix_minmax))(keys)
    if mode == "pair":
        # partner i <-> b-1-i shares one decision (timm _mix_pair)
        idx = jnp.arange(b)
        first = jnp.minimum(idx, b - 1 - idx)
        lam = lam[first]
        use_blend = use_blend[first]
        box = box[first]
    lam_b = lam[:, None, None, None]
    x_out = jnp.where(box[:, :, :, None], x_flip, x)
    x_out = jnp.where(use_blend[:, None, None, None],
                      lam_b * x + (1.0 - lam_b) * x_flip, x_out)
    targets = lam[:, None] * t1 + (1.0 - lam[:, None]) * t2
    return x_out.astype(x.dtype), targets
