"""Closed-form differentiable FLOPs model.

The reference measures per-op MACs at runtime by threading Python lists
through every forward (UVC/models/model_distilled.py:113-189) and probing the
model once with a ones-batch (UVC/joint_train.py:1010-1012); the measured
6-entry-per-block table is then consumed by ``calc_flops``
(UVC/uvc_utils.py:409-471).  On TPU the table is a pure function of the
config, so we compute it analytically once — ``build_macs_table`` reproduces
the probe's numbers exactly (golden value: DeiT-Tiny dense probe
2506.98 MFLOPs, /root/reference/log/deit-tiny-log.log "Initial FLOP size").

``flops_fraction`` is the differentiable resource function: given continuous
removal counts ``s`` (heads / MLP units), ``r`` (within-head dims) and a
block keep-probability vector, it returns compressed_FLOPs / dense_FLOPs with
straight-through gradients through the integer rounding (semantics of
``calc_flops``, UVC/uvc_utils.py:409-462).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import ViTConfig
from uvc_tpu.ops.stes import ste_ceil, ste_floor, bottom_k_mask, torch_clamp


class MacsTable(NamedTuple):
    """Static MACs accounting for one backbone at probe batch size 1.

    ``block [L, 6]`` columns are (qkv, q@k, attn@v, proj, fc1, fc2), the
    exact order the reference forward appends them (model_distilled.py:
    177-189 attention, :115-121 mlp) and ``calc_flops`` consumes them
    (uvc_utils.py:454-460).
    """

    embed: float          # patch-embedding (or T2T stem) MACs
    block: np.ndarray     # [L, 6] float64 per-block MACs
    dense_flops: float    # 2 * (embed + block.sum()) — the normalizer

    @property
    def m01(self) -> np.ndarray:
        return self.block[:, 0] + self.block[:, 1]

    @property
    def m23(self) -> np.ndarray:
        return self.block[:, 2] + self.block[:, 3]

    @property
    def m45(self) -> np.ndarray:
        return self.block[:, 4] + self.block[:, 5]


def _t2t_stem_macs(cfg: ViTConfig) -> float:
    """MACs of the tokens-to-token stem, mirroring the reference's inline
    accounting (performer: UVC/T2TViT/models/token_performer.py:54-68;
    only the two attention stages are counted — t2t_vit.py:105 returns
    macs1+macs2, soft-splits and the final projection are not counted).

    Note: the reference mlp term ``x.shape[2]*emb*emb`` omits the token
    axis (a quirk of the hand accounting); we mirror it verbatim because
    the stem MACs only enter the resource function as an additive constant
    and parity with published trajectories requires the same constant.
    """
    g = cfg.img_size // 4  # after first 7x7 stride-4 soft split
    emb = cfg.token_dim
    m = int(emb * 0.5)
    total = 0.0
    for (t, dim) in (((g * g), cfg.in_chans * 7 * 7),
                     ((g // 2) * (g // 2), cfg.token_dim * 3 * 3)):
        single_attn = (
            t * dim * 3 * emb          # kqv
            + (t * emb + emb * t * emb) * 2  # prm_exp(k), prm_exp(q)
            + t * m                    # D
            + t * emb * m              # kptv
            + t * m * emb              # y
            + t * emb * emb            # proj
        )
        mlp = t * emb * emb + emb * emb * emb
        total += single_attn + mlp
    return float(total)


def build_macs_table(cfg: ViTConfig) -> MacsTable:
    """Analytic per-block MACs table for probe batch 1.

    Matches the reference runtime probe
    ``model(torch.ones(1,3,224,224))`` (joint_train.py:1010-1012):

    * embed: ``num_patches * D * patch^2 * in_chans``
      (model_distilled.py:458-460 — computed on the 196-token tensor
      *before* cls concat).
    * per block with N = seq_len tokens:
      qkv ``3D*N*D``, q@k ``N^2*D``, attn@v ``N^2*D``, proj ``N*D^2``,
      fc1 ``d_ff*N*D``, fc2 ``D*N*d_ff``.
    """
    d = cfg.embed_dim
    n = cfg.seq_len
    dff = cfg.mlp_hidden
    if cfg.tokens_type == "none":
        embed = float(cfg.num_patches * d * cfg.patch_size ** 2 * cfg.in_chans)
    else:
        embed = _t2t_stem_macs(cfg)
    row = np.array([
        3 * d * n * d,   # qkv
        n * n * d,       # q @ k^T  (N * B*H*N*head_size)
        n * n * d,       # attn @ v
        n * d * d,       # output proj
        dff * n * d,     # fc1
        d * n * dff,     # fc2
    ], dtype=np.float64)
    block = np.tile(row, (cfg.depth, 1))
    dense = 2.0 * (embed + float(block.sum()))
    return MacsTable(embed=embed, block=block, dense_flops=dense)


def flops_fraction(s: jax.Array, r: jax.Array, scores2: jax.Array,
                   distrib1: jax.Array | float, table: MacsTable,
                   cfg: ViTConfig) -> jax.Array:
    """Differentiable compressed-FLOPs / dense-FLOPs.

    Args:
      s: ``[L, 2]`` continuous removal counts (heads, MLP units).  May be
        pre-ceiled; ``ste_ceil`` is idempotent on integers and keeps the
        straight-through gradient either way.
      r: ``[L, H]`` continuous within-head dim removal counts.
      scores2: ``[L, H]`` per-head importance (decides *which* heads count
        as fully removed — uvc_utils.py:422-431).
      distrib1: ``[L]`` per-block keep probability (Gumbel sample or softl0
        value), or the scalar 1.0 when gating is disabled.
      table: static MACs table.
      cfg: backbone config.

    Returns scalar FLOPs fraction in (0, 1].
    """
    h = cfg.num_heads
    hs = cfg.head_size
    d = cfg.embed_dim
    dff = cfg.mlp_hidden

    s_c = ste_ceil(s)
    r_c = ste_ceil(r)
    s_ub = jnp.array([h, dff], dtype=s.dtype)
    # torch_clamp, not jnp.clip: at s = 0 the ratio sits exactly on the
    # 1.0 boundary and must still receive the full budget-pressure grad
    # (torch clamp is boundary-inclusive; uvc_utils.py:415-416)
    s_ratio = torch_clamp((s_ub - s_c) / s_ub, 0.0, 1.0)  # [L, 2]

    # heads in the bottom-ceil(s0) by weight norm are wholly removed; the
    # remaining heads each lose r dims (uvc_utils.py:417-433).
    k_heads = jnp.ceil(jax.lax.stop_gradient(s[:, 0])).astype(jnp.int32)
    pruned_head = bottom_k_mask(scores2, k_heads)  # [L, H] True = removed
    attn_keep = (d - s_c[:, 0] * hs
                 - jnp.sum(jnp.where(pruned_head, 0.0, r_c), axis=-1))
    r_ratio = torch_clamp(attn_keep / d, 0.0, 1.0)  # [L]

    m01 = jnp.asarray(table.m01, dtype=s.dtype)
    m23 = jnp.asarray(table.m23, dtype=s.dtype)
    m45 = jnp.asarray(table.m45, dtype=s.dtype)
    per_block = (m01 * s_ratio[:, 0] + m23 * r_ratio + m45 * s_ratio[:, 1])
    macs = table.embed + jnp.sum(distrib1 * per_block)
    return 2.0 * macs / table.dense_flops


def flops2_fraction(s: jax.Array, r: jax.Array, scores2: jax.Array,
                    cfg: ViTConfig) -> jax.Array:
    """Alternative resource cost selected by ``--flops_with_mhsa 0``
    (``flops2``, UVC/uvc_utils.py:95-125; chosen at uvc_optimizer.py:191-200).

    A W1/W3-only linear-layer cost (no qkv/fc1/attention-matmul terms,
    no block gating, no patch term), normalized by its own value at
    ``s = r = 0``:

      * fc2 ("W3"):   ``2 * floor(d_ff - s1) * d + d``       per layer
      * attn.proj ("W1"): ``2 * in_dim * d + d`` with
        ``in_dim = d - floor(s0)*head_size - sum_kept floor(r)`` where
        "kept" heads are those NOT in the bottom-ceil(s0) by weight norm
        (uvc_utils.py:116-123).

    Quirk deliberately not copied: the reference path crashes at runtime —
    ``run_resource_fn`` (uvc_utils.py:220-224) always calls the resource fn
    with ``(s, r, gating_tuple, eps, gumbel_hard=...)`` but the flops2
    lambda (uvc_optimizer.py:192) accepts only ``(s, r, flops_list)``.
    We implement the intended cost (gating/eps-invariant), not the crash.
    ``ste_floor`` keeps the straight-through gradients of the reference
    (identity, so d(cost)/ds1 = -2d etc.).
    """
    d = float(cfg.embed_dim)
    dff = float(cfg.mlp_hidden)
    hs = float(cfg.head_size)

    mlp_in = ste_floor(dff - s[:, 1])                        # [L]
    term_w3 = 2.0 * mlp_in * d + d

    k_heads = jnp.ceil(jax.lax.stop_gradient(s[:, 0])).astype(jnp.int32)
    pruned_head = bottom_k_mask(scores2, k_heads)            # [L, H]
    attn_in = (d - ste_floor(s[:, 0]) * hs
               - jnp.sum(jnp.where(pruned_head, 0.0, ste_floor(r)), axis=-1))
    term_w1 = 2.0 * attn_in * d + d

    ub = cfg.depth * (2.0 * dff * d + d + 2.0 * d * d + d)
    return jnp.sum(term_w3 + term_w1) / ub
