"""Gumbel-softmax machinery and the soft-L0 gate.

TPU-native versions of the reference's stochastic gating primitives:

* 2-way Gumbel-softmax for block / attn / mlp skip gating
  (reference: F.gumbel_softmax at UVC/models/model_distilled.py:485 and
  UVC/uvc_utils.py:446 — tau=0.5, eps ignored, optional hard ST).
* hard top-k Gumbel token selection for patch slimming (reference custom
  gumbel_softmax + scatter: UVC/models/model_distilled.py:21-63, applied at
  :446-456).
* softl0 ``g^2 / (g^2 + eps)`` relaxation (reference SoftL0:
  UVC/uvc_optimizer.py:26-33 and the inline form at
  UVC/models/model_distilled.py:487).

All sampling threads explicit JAX PRNG keys — the replicated key makes the
per-rank architecture updates bitwise consistent across the data-parallel
mesh, which the reference only achieves by seeding determinism
(SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(key: jax.Array, logits: jax.Array, tau: float = 1.0,
                   hard: bool = False, axis: int = -1) -> jax.Array:
    """Sample from the Gumbel-softmax / concrete distribution.

    Matches ``torch.nn.functional.gumbel_softmax`` semantics (used by the
    reference for block gating with tau=0.5): soft sample is
    ``softmax((logits + G)/tau)``; hard returns a one-hot argmax with a
    straight-through gradient.
    """
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                            dtype=logits.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def gumbel_topk_mask(key: jax.Array, logits: jax.Array, k: int,
                     tau: float) -> jax.Array:
    """Hard straight-through top-k token mask.

    Reference semantics (UVC/models/model_distilled.py:36-63): perturb
    ``log_softmax(logits)`` with Gumbel noise, keep the top-k tokens as a
    0/1 mask, straight-through the soft distribution's gradient, then force
    token 0 on (:453).

    Args:
      key: PRNG key.
      logits: ``[B, N]`` token scores (pre log-softmax).
      k: static number of tokens to keep.
      tau: temperature (annealed 10 -> 0.1 over training in the reference:
        joint_train.py:404-407 via get_tau).

    Returns:
      ``[B, N]`` mask with exactly ``k`` ones per row (straight-through).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    g = jax.random.gumbel(key, log_probs.shape, dtype=log_probs.dtype)
    y_soft = jax.nn.softmax((log_probs + g) / tau, axis=-1)
    # top-k hard mask with static k: threshold at the k-th largest value.
    kth = jax.lax.top_k(y_soft, k)[0][..., -1:]
    y_hard = (y_soft >= kth).astype(y_soft.dtype)
    mask = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    # always keep the first token (reference: token_mask[:, 0] = 1)
    return mask.at[..., 0].set(1.0)


def topk_token_mask(logits: jax.Array, k: int) -> jax.Array:
    """Deterministic (noise-free) top-k token mask — the serving-time
    counterpart of ``gumbel_topk_mask``: keep exactly the ``k``
    highest-scoring tokens, with token 0 force-included by boosting its
    score (not appended), so the kept set has exactly ``k`` members and
    matches the physical token-drop gather in infer/compact.py."""
    boosted = logits.at[..., 0].set(jnp.inf)
    kth = jax.lax.top_k(boosted, k)[0][..., -1:]
    return (boosted >= kth).astype(logits.dtype)


def token_scores(t: jax.Array, scorer) -> jax.Array:
    """``[B, N]`` f32 selection scores from the linear token scorer
    (reference ``self.gumbel = Linear(d, 1)``: model_distilled.py:409).

    The single shared implementation for training (models/vit.py),
    compact fine-tuning (train/compact_ft.py) and serving
    (infer/compact.py) — the three must stay bit-identical or the
    trained kept-set drifts from the served one (E2EACC gate A7).
    """
    return (t.astype(jnp.float32)
            @ jnp.asarray(scorer["kernel"], jnp.float32)
            + jnp.asarray(scorer["bias"], jnp.float32)).squeeze(-1)


def physical_topk_indices(scores: jax.Array, k: int) -> jax.Array:
    """``[B, k]`` kept-token indices for the physical (serving-exact)
    token drop: token 0 force-kept by boosting its score *inside* the k
    budget (exactly ``topk_token_mask``'s decision rule), sorted
    ascending so the kept tokens preserve their relative order.  k is
    static, so every downstream shape stays static for XLA."""
    boosted = scores.at[..., 0].set(jnp.inf)
    return jnp.sort(jax.lax.top_k(boosted, k)[1], axis=-1)


def gather_tokens_with_pos(t: jax.Array, idx: jax.Array, tokens,
                           pos, dtype) -> jax.Array:
    """Physically drop unselected patch tokens: gather the kept tokens
    AND their positional-embedding rows, then prepend the prefix
    (cls/dist) tokens with theirs — dropped positions contribute
    nothing, unlike the masked path's positional ghost rows.

    Args:
      t: ``[B, N, D]`` patch tokens (pre pos-embed, ungathered).
      idx: ``[B, k]`` kept indices from ``physical_topk_indices``.
      tokens: list of ``[B, 1, D]`` prefix token arrays (already dtype).
      pos: ``[1, prefix+N, D]`` positional embedding table.

    Returns ``[B, prefix+k, D]`` with positions added everywhere.
    """
    b, n, d = t.shape
    prefix = len(tokens)
    pos = jnp.asarray(pos).astype(dtype)
    kept = jnp.take_along_axis(t, idx[..., None], axis=1)
    pos_patch = jnp.take_along_axis(
        jnp.broadcast_to(pos[:, prefix:], (b, n, d)), idx[..., None], axis=1)
    return jnp.concatenate(
        [jnp.concatenate(tokens, axis=1) + pos[:, :prefix],
         kept + pos_patch], axis=1)


def softl0(g: jax.Array, eps: jax.Array | float) -> jax.Array:
    """Soft-L0 gate ``g^2 / (g^2 + eps)`` (reference SoftL0 without the
    sqrt — the resource fn uses the un-sqrt'd form at uvc_utils.py:448-449).
    """
    g2 = g * g
    return g2 / (g2 + eps)


def block_gating_distrib(key: jax.Array, gating: jax.Array, *,
                         use_gumbel: bool, gumbel_hard: bool,
                         eps: jax.Array | float,
                         warmup: bool) -> jax.Array:
    """Per-layer keep/skip distribution for block gating.

    Args:
      gating: ``[L, 2]`` skip-gating logits (init [-1, 1]).

    Returns:
      ``[L, 2]`` distribution rows ``(skip_prob, keep_prob)``.

    Mirrors the three modes of the reference block loop
    (UVC/models/model_distilled.py:480-493): warmup forces (0.5, 0.5);
    use_gumbel samples a tau=0.5 Gumbel-softmax per layer; otherwise the
    softl0 relaxation of the keep logit.
    """
    if warmup:
        return jnp.full_like(gating, 0.5)
    if use_gumbel:
        return gumbel_softmax(key, gating, tau=0.5, hard=gumbel_hard, axis=-1)
    keep = softl0(gating[:, 1], eps)
    return jnp.stack([1.0 - keep, keep], axis=-1)
