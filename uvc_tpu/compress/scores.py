"""Vectorized structured-group importance scores.

Replaces the reference's per-layer Python loops over ``torch.topk`` calls
(``weight_list_to_scores``, UVC/uvc_utils.py:54-73) with three batched
reductions over the stacked block parameters — one fused XLA kernel each,
no host sync.

Group semantics (identical to the reference):

* ``W1`` = the attention output projection.  Its *input* features are laid
  out head-major ``[H * head_size]``; per-(head, dim) scores are the squared
  l2 norms of the corresponding input column, per-head scores are their sum.
* ``W3`` = MLP fc2.  Per-hidden-unit scores are squared l2 norms of each
  input column.

Scores are computed from ``stop_gradient``'d weights — the reference reads
``layer.weight.data`` (detached) so no gradient ever flows weights<-scores.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def group_scores(blocks: dict, num_heads: int
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute (scores1, scores2, scores3) for all layers at once.

    Args:
      blocks: stacked block params with ``proj.kernel [L, D, D]`` (in, out)
        and ``fc2.kernel [L, d_ff, D]``.
      num_heads: number of attention heads H.

    Returns:
      scores1: ``[L, H, head_size]`` per-(head, dim) squared-norm scores
        (reference result_level1).
      scores2: ``[L, H]`` per-head scores (reference result_level2).
      scores3: ``[L, d_ff]`` per-MLP-unit scores (reference "W3" scores).
    """
    pk = jax.lax.stop_gradient(blocks["proj"]["kernel"]).astype(jnp.float32)
    l, d, _ = pk.shape
    head_size = d // num_heads
    col_sq = jnp.sum(pk * pk, axis=-1)  # [L, D] per-input-column norms^2
    scores1 = col_sq.reshape(l, num_heads, head_size)
    scores2 = jnp.sum(scores1, axis=-1)
    f2 = jax.lax.stop_gradient(blocks["fc2"]["kernel"]).astype(jnp.float32)
    scores3 = jnp.sum(f2 * f2, axis=-1)  # [L, d_ff]
    return scores1, scores2, scores3
