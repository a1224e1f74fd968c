"""Structured masks, proximal weight shrinkage, and parameter accounting.

TPU-native redesign of the reference's in-place weight surgery
(UVC/uvc_utils.py:315-401):

* ``prox_weights`` — per-step proximal shrinkage of the bottom weight groups
  by ``1/(1 + 2*lr*dual)`` (reference prox_w :315-345), as a pure
  params -> params map fused into the jitted train step.
* ``build_masks`` — compact structural masks: ``attn [L, D]`` over the
  attention-projection *input* features (head-major) and ``mlp [L, d_ff]``
  over MLP hidden units.  The reference materializes full weight-shaped
   0/1 buffers (prune_w_mask :376-401); masking the *activations* feeding
  proj / fc2 is functionally identical (pruned fc1 rows still leave their
  bias, but the zeroed fc2 column kills the contribution in both designs)
  and keeps masks tiny + shapes static for XLA.
* ``prune_weights`` — hard-zero the masked columns/rows in the params
  (reference prune_w :348-372), used for checkpoint export parity.
* ``count_remaining_params`` — analytic equivalent of summing mask buffers
  (reference count_mask, joint_train.py:182-188).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig
from uvc_tpu.compress.scores import group_scores
from uvc_tpu.ops.stes import bottom_k_mask


def _structural_keep_masks(params: dict, s: jax.Array, r: jax.Array,
                           cfg: ViTConfig) -> Tuple[jax.Array, jax.Array]:
    """Return (attn_keep [L, D], mlp_keep [L, d_ff]) 0/1 float masks.

    attn column j of head h is kept unless (a) dim j is in the bottom
    ceil(r[l,h]) of head h, or (b) head h is in the bottom ceil(s[l,0])
    heads — mirroring the two passes of prune_w_mask.
    """
    scores1, scores2, scores3 = group_scores(params["blocks"], cfg.num_heads)
    l = scores2.shape[0]
    k_r = jnp.ceil(r).astype(jnp.int32)                 # [L, H]
    dim_pruned = bottom_k_mask(scores1, k_r)            # [L, H, hs]
    k_heads = jnp.ceil(s[:, 0]).astype(jnp.int32)       # [L]
    head_pruned = bottom_k_mask(scores2, k_heads)       # [L, H]
    attn_pruned = dim_pruned | head_pruned[..., None]
    attn_keep = (~attn_pruned).reshape(l, cfg.embed_dim).astype(jnp.float32)
    k_mlp = jnp.ceil(s[:, 1]).astype(jnp.int32)
    mlp_keep = (~bottom_k_mask(scores3, k_mlp)).astype(jnp.float32)
    return attn_keep, mlp_keep


def build_masks(params: dict, s: jax.Array, r: jax.Array,
                cfg: ViTConfig) -> Dict[str, jax.Array]:
    attn_keep, mlp_keep = _structural_keep_masks(params, s, r, cfg)
    return {"attn": attn_keep, "mlp": mlp_keep}


def prox_weights(params: dict, s: jax.Array, r: jax.Array, y: jax.Array,
                 p: jax.Array, lr: jax.Array, cfg: ViTConfig) -> dict:
    """Proximal shrink of bottom groups (reference prox_w).

    Order matters and is preserved: per-head bottom-r columns are shrunk by
    ``1/(1+2*lr*p[l,h])`` for *all* heads first, then whole bottom-s heads
    by ``1/(1+2*lr*y[l,0])`` (multiplicative on overlap), then fc2's bottom
    s1 input columns by ``1/(1+2*lr*y[l,1])``.  Duals are detached.
    """
    scores1, scores2, scores3 = group_scores(params["blocks"], cfg.num_heads)
    l = scores2.shape[0]
    y = jax.lax.stop_gradient(y)
    p = jax.lax.stop_gradient(p)

    k_r = jnp.ceil(r).astype(jnp.int32)
    dim_sel = bottom_k_mask(scores1, k_r)               # [L, H, hs]
    shrink_r = jnp.where(dim_sel, 1.0 / (1.0 + 2.0 * lr * p[..., None]), 1.0)

    k_heads = jnp.ceil(s[:, 0]).astype(jnp.int32)
    head_sel = bottom_k_mask(scores2, k_heads)          # [L, H]
    shrink_s = jnp.where(head_sel[..., None],
                         1.0 / (1.0 + 2.0 * lr * y[:, 0][:, None, None]), 1.0)

    col_scale = (shrink_r * shrink_s).reshape(l, cfg.embed_dim)  # [L, D]

    k_mlp = jnp.ceil(s[:, 1]).astype(jnp.int32)
    mlp_sel = bottom_k_mask(scores3, k_mlp)             # [L, d_ff]
    mlp_scale = jnp.where(mlp_sel,
                          1.0 / (1.0 + 2.0 * lr * y[:, 1][:, None]), 1.0)

    blocks = dict(params["blocks"])
    proj = dict(blocks["proj"])
    proj["kernel"] = blocks["proj"]["kernel"] * col_scale[:, :, None]
    fc2 = dict(blocks["fc2"])
    fc2["kernel"] = blocks["fc2"]["kernel"] * mlp_scale[:, :, None]
    blocks["proj"] = proj
    blocks["fc2"] = fc2
    out = dict(params)
    out["blocks"] = blocks
    return out


def prune_weights(params: dict, masks: Dict[str, jax.Array],
                  cfg: ViTConfig) -> dict:
    """Hard-zero pruned groups in the weights (reference prune_w): proj
    input columns, fc2 input columns, and fc1 output rows (W2 follows W3:
    uvc_utils.py:372)."""
    blocks = dict(params["blocks"])
    proj = dict(blocks["proj"])
    proj["kernel"] = blocks["proj"]["kernel"] * masks["attn"][:, :, None]
    fc2 = dict(blocks["fc2"])
    fc2["kernel"] = blocks["fc2"]["kernel"] * masks["mlp"][:, :, None]
    fc1 = dict(blocks["fc1"])
    fc1["kernel"] = blocks["fc1"]["kernel"] * masks["mlp"][:, None, :]
    blocks.update(proj=proj, fc1=fc1, fc2=fc2)
    out = dict(params)
    out["blocks"] = blocks
    return out


# Stage-2 enforces ``weight *= mask`` every step (post_train.py:357-360).
# In this framework the same computation is achieved by multiplying the
# activations feeding proj/fc2 with the masks inside the model apply fn
# (models/vit.py), so ``apply_masks_to_params`` is only needed when
# exporting a checkpoint with literally-zeroed weights.
apply_masks_to_params = prune_weights


def total_maskable_params(params: dict) -> jax.Array:
    """Total count the reference's count_mask reports at init: every module
    with a ``weight`` gets a ones mask (joint_train.py:169-171), i.e. all
    kernel/scale leaves (biases excluded)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if "kernel" in name or "scale" in name:
            total += leaf.size
    return jnp.asarray(total, jnp.float32)


def count_remaining_params(params: dict, masks: Dict[str, jax.Array],
                           cfg: ViTConfig) -> jax.Array:
    """Analytic mask-sum: total maskable minus pruned entries.

    Pruned entries per layer l: attn-pruned columns x D rows (proj), mlp-
    pruned units x (D fc2 rows + D fc1 columns).
    """
    d = cfg.embed_dim
    attn_removed = jnp.sum(1.0 - masks["attn"]) * d
    mlp_removed = jnp.sum(1.0 - masks["mlp"]) * (2 * d)
    return total_maskable_params(params) - attn_removed - mlp_removed
