"""Unstructured / structured pruning baselines (the reference's
``Baseline_pruning`` suite: pruning_utils.py, generating_mask.py).

TPU-native redesign: the reference mutates per-module ``weight_mask``
buffers inside swapped-in masked ``Linear``/``Conv2d`` layers
(Baseline_pruning/layers.py:10-41, pruning_utils.py:28-106); here masks are
an explicit pytree mirroring the maskable kernels, produced by pure score →
threshold functions and consumed either by multiplying them into the
parameters inside a jitted train step (``apply_weight_masks`` — the moral
equivalent of ``W = mask * weight`` in the masked layers' forward) or by
hard-pruning once.  Scoring is whole-pytree vectorized — no per-module
Python loops at step time.

Scorers (pruning_utils.py):
  * Mag     — |w|                            (:143-149)
  * SynFlow — |dR/dw * w| on an all-ones input through the |w|-linearized
              network, iterated with an exponential density schedule
              (:108-141; prune_loop generating_mask.py:26-37)
  * Taylor1ScorerAbs — |dL/dw * w| accumulated over real batches (:151-164)
  * SP      — structured per-head / per-channel masks from gradient scores
              (generating_mask.py:247-330, sp_vision_transformer.py:106-145)

Thresholding matches ``Pruner._global_mask`` / ``_local_mask``
(pruning_utils.py:37-66): keep scores strictly above the k-th smallest
value, where k = (1 - density) * numel.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig


# ---------------------------------------------------------------------------
# which leaves are prunable
# ---------------------------------------------------------------------------

#: path substrings of maskable kernels — every Linear/Conv weight of the
#: backbone, mirroring masked_parameters() which yields every
#: Conv2d/Linear weight (pruning_utils.py:18-26)
_MASKABLE_SUFFIXES = (
    "patch_embed.kernel", "qkv.kernel", "proj.kernel",
    "fc1.kernel", "fc2.kernel", "head.kernel", "head_dist.kernel",
    "token_scorer.kernel",
)


def _path_str(path) -> str:
    return jax.tree_util.keystr(path).replace("'", "").replace("[", ".") \
        .replace("]", "").lstrip(".")


def maskable_paths(params: dict) -> List[str]:
    out = []
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        s = _path_str(path)
        if any(s.endswith(suf) for suf in _MASKABLE_SUFFIXES):
            out.append(s)
    return out


def _is_maskable(path) -> bool:
    s = _path_str(path)
    return any(s.endswith(suf) for suf in _MASKABLE_SUFFIXES)


def _map_maskable(fn: Callable, params: dict, *rest) -> dict:
    """Map fn over maskable leaves, None elsewhere (pytree of same shape)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf, *r: fn(leaf, *r) if _is_maskable(path) else None,
        params, *rest)


def identity_masks(params: dict) -> dict:
    """All-ones masks (prune_model_identity, pruning_utils.py:193-199)."""
    return _map_maskable(jnp.ones_like, params)


def apply_weight_masks(params: dict, masks: dict) -> dict:
    """w * mask for every maskable kernel — the masked layers' forward
    (Baseline_pruning/layers.py:18-24) as a pure function, fused by XLA
    into the consuming matmul."""
    return jax.tree_util.tree_map_with_path(
        lambda path, w, m: w * m if m is not None else w, params, masks,
        is_leaf=lambda x: x is None)


def masks_to_flat(masks: dict, params: dict) -> dict:
    """Flatten a mask pytree (None at non-maskable leaves) to
    {path: array} for serialization (msgpack cannot carry None)."""
    import numpy as np
    flat = {}
    for (path, leaf), m in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree.leaves(masks, is_leaf=lambda x: x is None)):
        if m is not None:
            flat[_path_str(path)] = np.asarray(m)
    return flat


def masks_from_flat(flat: dict, params: dict) -> dict:
    """Rebuild the mask pytree from {path: array} (inverse of
    masks_to_flat); the reference analog is loading a saved
    ``weight_mask`` state dict (Baseline_pruning/main.py:291-298)."""

    def pick(path, leaf):
        s = _path_str(path)
        if s in flat:
            return jnp.asarray(flat[s])
        return None

    return jax.tree_util.tree_map_with_path(pick, params)


def mask_sparsity(masks: dict) -> float:
    """Fraction of weights remaining (check_sparsity_dict,
    pruning_utils.py:179-192)."""
    leaves = [m for m in jax.tree.leaves(masks) if m is not None]
    total = sum(m.size for m in leaves)
    remain = sum(float(jnp.sum(m)) for m in leaves)
    return remain / max(total, 1)


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------


def magnitude_scores(params: dict) -> dict:
    """Mag.score: |w| (pruning_utils.py:143-149)."""
    return _map_maskable(jnp.abs, params)


def taylor_scores(params: dict, loss_fn: Callable,
                  batches: Iterable) -> dict:
    """Taylor1ScorerAbs.score: |sum_batches dL/dw * w|
    (pruning_utils.py:151-164 — grads accumulate over the loader because
    the reference never zeroes between batches)."""
    grad_fn = jax.jit(jax.grad(loss_fn))
    acc = None
    for batch in batches:
        g = grad_fn(params, *batch)
        acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
    return _map_maskable(lambda w, g: jnp.abs(g * w), params, acc)


def synflow_scores(params: dict, forward_sum: Callable,
                   density: float, epochs: int = 100) -> dict:
    """SynFlow with the exponential schedule of prune_loop
    (generating_mask.py:26-37; pruning_utils.py:108-141).

    ``forward_sum(abs_params) -> scalar`` must run the network on an
    all-ones batch and sum the output (the synaptic-flow objective).
    Iterates: score on the |w|-linearized masked network, then re-threshold
    at density**((epoch+1)/epochs), returning the final masks' scores.
    """
    abs_params = jax.tree.map(jnp.abs, params)
    grad_fn = jax.jit(jax.grad(
        lambda p, m: forward_sum(apply_weight_masks(p, m))))
    masks = identity_masks(params)
    scores = None
    for epoch in range(epochs):
        g = grad_fn(abs_params, masks)
        scores = _map_maskable(lambda w, gg: jnp.abs(gg * w), abs_params, g)
        d = density ** ((epoch + 1) / epochs)
        masks = global_threshold_mask(scores, d)
    return scores, masks


# ---------------------------------------------------------------------------
# thresholding
# ---------------------------------------------------------------------------


def _threshold(flat: jax.Array, density: float):
    """k-th smallest value with k = (1-density)*numel; keep score > thr
    (pruning_utils.py:44-52)."""
    k = int((1.0 - density) * flat.size)
    if k < 1:
        return None
    return jnp.sort(flat)[k - 1]


def global_threshold_mask(scores: dict, density: float) -> dict:
    """One global threshold across all maskable leaves
    (Pruner._global_mask, pruning_utils.py:37-52)."""
    leaves = [s.ravel() for s in jax.tree.leaves(scores) if s is not None]
    thr = _threshold(jnp.concatenate(leaves), density)
    if thr is None:
        return jax.tree.map(jnp.ones_like, scores,
                            is_leaf=lambda x: x is None)
    return jax.tree.map(
        lambda s: (s > thr).astype(jnp.float32) if s is not None else None,
        scores, is_leaf=lambda x: x is None)


def local_threshold_mask(scores: dict, density: float) -> dict:
    """Per-leaf threshold (Pruner._local_mask, pruning_utils.py:54-66)."""

    def one(s):
        if s is None:
            return None
        thr = _threshold(s.ravel(), density)
        if thr is None:
            return jnp.ones_like(s)
        return (s > thr).astype(jnp.float32)

    return jax.tree.map(one, scores, is_leaf=lambda x: x is None)


# ---------------------------------------------------------------------------
# SP: structured head / MLP-channel masks from gradients
# ---------------------------------------------------------------------------


def sp_structured_masks(params: dict, grads: dict, cfg: ViTConfig,
                        atten_density: float,
                        mlp_density: float) -> Dict[str, jax.Array]:
    """Structured sanity-pruning masks (generating_mask.py:247-330).

    Head scores: the reference records ``|sum(grad * value)|`` per head via
    a backward hook on the value tensor (sp_vision_transformer.py:106-145);
    the chain rule gives the identical quantity from weight-space as
    ``|sum(dL/dW_v * W_v)|`` over each head's value rows — no hooks needed.
    MLP channel scores: ||dL/dW_fc1||_1 per row + ||dL/dW_fc2||_1 per column
    (generating_mask.py:327-330).

    Returns structural keep masks {"attn": [L, H] heads, "mlp": [L, F]}
    compatible with the model's activation-masking path.
    """
    l, h, hs = cfg.depth, cfg.num_heads, cfg.head_size
    d = cfg.embed_dim

    qkv_w = params["blocks"]["qkv"]["kernel"]        # [L, D, 3D]
    qkv_g = grads["blocks"]["qkv"]["kernel"]
    v_w = qkv_w[:, :, 2 * d:].reshape(l, d, h, hs)   # value block per head
    v_g = qkv_g[:, :, 2 * d:].reshape(l, d, h, hs)
    head_scores = jnp.abs(jnp.sum(v_g * v_w, axis=(1, 3)))   # [L, H]

    keep_heads = max(int(atten_density * h), 1)
    rank = jnp.argsort(jnp.argsort(head_scores, axis=1), axis=1)  # 0=lowest
    attn_mask = (rank >= h - keep_heads).astype(jnp.float32)

    fc1_g = grads["blocks"]["fc1"]["kernel"]          # [L, D, F]
    fc2_g = grads["blocks"]["fc2"]["kernel"]          # [L, F, D]
    chan = (jnp.sum(jnp.abs(fc1_g), axis=1)
            + jnp.sum(jnp.abs(fc2_g), axis=2))        # [L, F]
    f = chan.shape[1]
    keep_chan = max(int(mlp_density * f), 1)
    crank = jnp.argsort(jnp.argsort(chan, axis=1), axis=1)
    mlp_mask = (crank >= f - keep_chan).astype(jnp.float32)

    return {"attn": attn_mask, "mlp": mlp_mask}


def head_masks_to_weight_masks(head_mask: jax.Array, mlp_mask: jax.Array,
                               params: dict, cfg: ViTConfig) -> dict:
    """Expand structural [L,H] / [L,F] keep masks to elementwise qkv /
    fc1 / fc2 weight masks (the reference writes the q/k/v row-blocks of
    ``qkv.weight_mask``: generating_mask.py:311-323)."""
    l, h, hs, d = cfg.depth, cfg.num_heads, cfg.head_size, cfg.embed_dim
    per_dim = jnp.repeat(head_mask, hs, axis=1)            # [L, D]
    qkv_mask = jnp.tile(per_dim, (1, 3))                   # [L, 3D]
    masks = identity_masks(params)
    masks["blocks"]["qkv"]["kernel"] = (
        jnp.ones_like(params["blocks"]["qkv"]["kernel"])
        * qkv_mask[:, None, :])
    masks["blocks"]["fc1"]["kernel"] = (
        jnp.ones_like(params["blocks"]["fc1"]["kernel"])
        * mlp_mask[:, None, :])
    masks["blocks"]["fc2"]["kernel"] = (
        jnp.ones_like(params["blocks"]["fc2"]["kernel"])
        * mlp_mask[:, :, None])
    return masks
