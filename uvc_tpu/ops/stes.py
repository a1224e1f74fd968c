"""Straight-through estimators and the bottom-k group-norm reduction.

TPU-native reformulation of the reference custom autograd Functions:

* ``ste_ceil`` / ``ste_floor`` — identity-gradient rounding
  (reference: UVC/uvc_utils.py:26-52).
* ``least_k_sum`` — sum of the smallest ceil(s) entries of a score vector,
  whose gradient w.r.t. ``s`` is the (s+1)-th smallest entry
  (reference LeastSsum: UVC/uvc_utils.py:75-92).

The reference computes bottom-k with data-dependent ``torch.topk`` calls in
Python loops over layers and heads (O(L*H) host-synced kernel launches per
step).  Here everything is rank-comparison based — a full sort once per score
tensor, then masks built by comparing rank < k with *traced* k — which keeps
shapes static for XLA and vectorizes over all layers/heads at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_ceil(a: jax.Array) -> jax.Array:
    return jnp.ceil(a)


def _ste_ceil_fwd(a):
    return jnp.ceil(a), None


def _ste_ceil_bwd(_, g):
    return (g,)


ste_ceil.defvjp(_ste_ceil_fwd, _ste_ceil_bwd)


@jax.custom_vjp
def ste_floor(a: jax.Array) -> jax.Array:
    return jnp.floor(a)


def _ste_floor_fwd(a):
    return jnp.floor(a), None


def _ste_floor_bwd(_, g):
    return (g,)


ste_floor.defvjp(_ste_floor_fwd, _ste_floor_bwd)


@jax.custom_vjp
def least_k_sum(s: jax.Array, scores: jax.Array) -> jax.Array:
    """Sum of the smallest ``ceil(s)`` entries of ``scores``, batched.

    Args:
      s: continuous removal counts, shape ``[...]`` (any leading batch shape).
      scores: group scores, shape ``[..., n]`` matching ``s``'s batch shape.

    Returns:
      ``[...]`` sums.  Semantics match the reference LeastSsum
      (UVC/uvc_utils.py:75-92): forward sums the bottom ``k = ceil(s)``
      values (all of them when ``k >= n``); backward w.r.t. ``s`` is the
      ``(k+1)``-th smallest value (the max when ``k+1 > n``); ``scores``
      receives no gradient (the reference detaches weights before scoring).
    """
    return _least_k_sum_fwd(s, scores)[0]


def _least_k_sum_fwd(s, scores):
    n = scores.shape[-1]
    srt = jnp.sort(scores, axis=-1)
    k = jnp.clip(jnp.ceil(s), 0, n).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, srt.shape, srt.ndim - 1)
    val = jnp.sum(jnp.where(idx < k[..., None], srt, 0.0), axis=-1)
    # gradient seed: the (k+1)-th smallest, i.e. srt[k], clamped to the max.
    grad_seed = jnp.take_along_axis(
        srt, jnp.minimum(k, n - 1)[..., None], axis=-1)[..., 0]
    return val, grad_seed


def _least_k_sum_bwd(grad_seed, g):
    return g * grad_seed, None


least_k_sum.defvjp(_least_k_sum_fwd, _least_k_sum_bwd)


@jax.custom_vjp
def torch_clamp(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """``torch.clamp`` with torch's boundary-inclusive gradient.

    ``jnp.clip`` lowers to min/max, whose JAX gradients split 50/50 at
    exact ties — so a value sitting exactly ON the clamp boundary (e.g.
    the FLOPs ratio 1.0 at s = 0) receives only half the upstream
    gradient.  torch's clamp backward passes the full gradient wherever
    ``lo <= x <= hi`` (inclusive), which the resource function's
    semantics depend on (uvc_utils.py:416,436: ratios start at the 1.0
    boundary with full budget pressure).  Found by the differential test
    (tests/test_reference_differential.py): at init the reference's
    s/r resource grads are exactly 2x the jnp.clip version's.
    """
    return jnp.clip(x, lo, hi)


def _torch_clamp_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), (x >= lo) & (x <= hi)


def _torch_clamp_bwd(inside, g):
    return (jnp.where(inside, g, 0.0), None, None)


torch_clamp.defvjp(_torch_clamp_fwd, _torch_clamp_bwd)


def bottom_k_mask(scores: jax.Array, k: jax.Array) -> jax.Array:
    """Boolean mask selecting the ``k`` smallest entries along the last axis.

    ``k`` may be traced (changes every step).  Ties broken by index order,
    matching ``torch.topk(largest=False)``'s stable behaviour closely enough
    for mask construction (reference: UVC/uvc_utils.py:328, 334, 343).
    """
    order = jnp.argsort(scores, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1, stable=True)
    return ranks < jnp.asarray(k)[..., None]
