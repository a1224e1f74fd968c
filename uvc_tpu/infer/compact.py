"""Physical model compaction for serving.

The reference deploys a "compressed" model that still computes at dense
shapes — masks zero the weights but every matmul runs full size
(post_train.py enforces ``weight *= mask``; nothing is ever sliced).  On
TPU we can do materially better: turn the discovered architecture into a
*physically smaller* model —

  * blocks the gating decided to skip are removed outright
    (keep = g1 > g0, the stage-2 frozen decision);
  * attention heads whose columns are fully pruned are sliced out of
    q/k/v/proj (within-head dim pruning stays as zeros in the kept heads:
    the reference's r-pruning only zeroes the v/proj side —
    uvc_utils.py:376-401 — so q/k of kept heads remain active);
  * MLP hidden units are gathered to the kept set, padded up to the MXU
    lane quantum (128) so the sliced matmuls stay tile-aligned.

Because kept sizes differ per layer, the compact model is an unrolled
per-layer program (compiled once) instead of a homogeneous scan.  Output
is numerically identical to the masked dense model (padding slots carry
zero weights), at genuinely reduced FLOPs and memory.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import ViTConfig
from uvc_tpu.models import vit
from uvc_tpu.models.vit import ForwardOutput, _layer_norm
from uvc_tpu.ops.gumbel import (gather_tokens_with_pos,
                                physical_topk_indices, token_scores)


def _pad_to(n: int, q: int = 128) -> int:
    return max(q, -(-n // q) * q)


def layer_plans(masks: Dict[str, jax.Array], cfg: ViTConfig, *,
                block_keep: np.ndarray,
                lane_align: int = 128) -> List[dict]:
    """Per-kept-layer slicing plan shared by serving compaction and
    compact stage-2 training (train/compact_ft.py): which original block
    each compact layer maps to, the q/k/v column gather, the within-head
    v-mask, and the lane-padded kept-MLP-unit set."""
    attn_keep = np.asarray(masks["attn"])        # [L, D] head-major
    mlp_keep = np.asarray(masks["mlp"])          # [L, F]
    l, d = attn_keep.shape
    h, hs = cfg.num_heads, cfg.head_size
    plans = []
    for i in range(l):
        if not bool(block_keep[i]):
            continue
        keep_dims = attn_keep[i].reshape(h, hs)
        kept_heads = np.nonzero(keep_dims.any(axis=1))[0]
        hk = max(len(kept_heads), 1)
        if len(kept_heads) == 0:
            kept_heads = np.array([0])
        # q/k/v column gather: head-h block = columns [h*hs, (h+1)*hs) of
        # each of the three d-sized segments
        cols = np.concatenate(
            [np.arange(hh * hs, (hh + 1) * hs) for hh in kept_heads])
        sel3 = np.concatenate([cols, d + cols, 2 * d + cols])
        # within-head pruned dims stay, zeroed on the v/proj side only
        # (uvc_utils.py:376-401: q/k of kept heads remain active)
        vmask = keep_dims[kept_heads].reshape(-1)     # [hk*hs]
        kept_units = np.nonzero(mlp_keep[i] > 0)[0]
        # pad kept units to the MXU lane quantum, but never beyond dense
        fk = min(_pad_to(len(kept_units), lane_align), mlp_keep.shape[1])
        plans.append({"layer_id": i, "hk": int(hk), "cols": cols,
                      "sel3": sel3, "vmask": vmask,
                      "kept_units": kept_units, "fk": int(fk)})
    return plans


def compact_model(params: dict, masks: Dict[str, jax.Array],
                  cfg: ViTConfig, *,
                  block_keep: Optional[np.ndarray] = None,
                  lane_align: int = 128) -> Tuple[List[dict], dict]:
    """Slice the pruned architecture out of the parameters.

    Returns (layers, top): per-kept-layer weight dicts with layer-specific
    shapes, plus the shared top-level params (embeddings, norm, heads).
    """
    blocks = jax.tree.map(np.asarray, params["blocks"])
    mlp_keep = np.asarray(masks["mlp"])          # [L, F]
    d = np.asarray(masks["attn"]).shape[1]
    if block_keep is None:
        g = np.asarray(params["block_gating"])
        block_keep = g[:, 1] > g[:, 0]           # stage-2 frozen decision

    layers = []
    for plan in layer_plans(masks, cfg, block_keep=block_keep,
                            lane_align=lane_align):
        i = plan["layer_id"]
        hk, cols, sel3 = plan["hk"], plan["cols"], plan["sel3"]
        vmask, kept_units, fk = (plan["vmask"], plan["kept_units"],
                                 plan["fk"])
        qkv_c = blocks["qkv"]["kernel"][i][:, sel3]
        qkv_bc = blocks["qkv"]["bias"][i][sel3]
        proj = blocks["proj"]["kernel"][i][cols, :] * vmask[:, None]
        proj_b = blocks["proj"]["bias"][i]

        fc1 = np.zeros((d, fk), blocks["fc1"]["kernel"].dtype)
        fc1_b = np.zeros((fk,), blocks["fc1"]["bias"].dtype)
        fc2 = np.zeros((fk, d), blocks["fc2"]["kernel"].dtype)
        if len(kept_units):
            fc1[:, :len(kept_units)] = \
                blocks["fc1"]["kernel"][i][:, kept_units]
            fc1_b[:len(kept_units)] = blocks["fc1"]["bias"][i][kept_units]
            fc2[:len(kept_units), :] = \
                blocks["fc2"]["kernel"][i][kept_units, :]
        layers.append({
            "ln1": {"scale": blocks["ln1"]["scale"][i],
                    "bias": blocks["ln1"]["bias"][i]},
            "qkv": {"kernel": qkv_c, "bias": qkv_bc},
            "proj": {"kernel": proj, "bias": proj_b},
            "ln2": {"scale": blocks["ln2"]["scale"][i],
                    "bias": blocks["ln2"]["bias"][i]},
            "fc1": {"kernel": fc1, "bias": fc1_b},
            "fc2": {"kernel": fc2, "bias": blocks["fc2"]["bias"][i]},
            "num_heads": int(hk),
        })

    top_keys = ["patch_embed", "cls_token", "pos_embed", "norm", "head"]
    top = {k: jax.tree.map(np.asarray, params[k]) for k in top_keys
           if k in params}
    for k in ("dist_token", "head_dist", "resnet", "t2t", "token_scorer"):
        if k in params:
            top[k] = jax.tree.map(np.asarray, params[k])
    return layers, top


def apply_compact(layers: List[dict], top: dict, x: jax.Array,
                  cfg: ViTConfig, *, dtype=jnp.bfloat16,
                  token_ratio: Optional[float] = None) -> ForwardOutput:
    """Inference forward of the compacted model (eval semantics).

    ``token_ratio`` physically drops tokens at serving using the trained
    token scorer: per image, only the static top-``int(ratio*N)`` patch
    tokens (token 0 force-kept, matching the training mask's
    ``mask[:, 0] = 1``) enter the transformer — the sequence axis really
    shrinks, unlike the dense path where unselected tokens remain as
    positional "ghost" rows multiplied to zero before pos-embed add
    (models/vit.py:282-296; reference model_distilled.py:446-456).
    Logits therefore agree with the masked dense model only up to the
    ghost tokens' (small, position-only) contribution; the kept-token
    *selection* is identical to the deterministic eval mask
    (ops/gumbel.py topk_token_mask).  ViT family only (T2T's UVC path
    has no token selection)."""
    eps = cfg.layer_norm_eps
    b = x.shape[0]
    if cfg.tokens_type != "none":
        # T2T family: dense tokens-to-token stem + fixed sinusoid pos
        from uvc_tpu.models.t2t_vit import sinusoid_pos_embed, t2t_stem
        t = t2t_stem(top, x, cfg, dtype)
        cls = jnp.broadcast_to(jnp.asarray(top["cls_token"]),
                               (b, 1, cfg.embed_dim)).astype(dtype)
        t = jnp.concatenate([cls, t], axis=1)
        t = t + jnp.asarray(sinusoid_pos_embed(
            cfg.num_patches + 1, cfg.embed_dim)).astype(dtype)
    else:
        t = vit.patch_embed(top, x, cfg, dtype)
        tokens = [jnp.broadcast_to(jnp.asarray(top["cls_token"]),
                                   (b, 1, cfg.embed_dim)).astype(dtype)]
        if cfg.distilled and "dist_token" in top:
            tokens.append(jnp.broadcast_to(
                jnp.asarray(top["dist_token"]),
                (b, 1, cfg.embed_dim)).astype(dtype))
        if token_ratio is not None and token_ratio < 1.0 \
                and "token_scorer" in top:
            # physical token slimming: gather the top-k scored patches
            # (and their pos-embed rows) per image via the shared
            # serving-exact helpers (ops/gumbel.py) — the SAME code path
            # vit.apply(patch_physical=True) and compact_ft train with
            k = int(token_ratio * cfg.num_patches)
            idx = physical_topk_indices(
                token_scores(t, top["token_scorer"]), k)
            t = gather_tokens_with_pos(t, idx, tokens, top["pos_embed"],
                                       dtype)
        else:
            t = jnp.concatenate(tokens + [t], axis=1)
            t = t + jnp.asarray(top["pos_embed"]).astype(dtype)

    from uvc_tpu.ops.attention import layer_attention_ln
    from uvc_tpu.ops.mlp import mlp_ln

    scale = cfg.head_size ** -0.5
    for blk in layers:
        hk = blk["num_heads"]
        da = blk["proj"]["kernel"].shape[0]
        fk = blk["fc1"]["kernel"].shape[1]
        # the same LN-fused sublayer programs the training path uses —
        # their FORWARD kernels support rectangular widths (only the
        # backward is square-only, and serving never differentiates);
        # the within-head vmask is folded into proj rows at compaction
        t = layer_attention_ln(
            t, jnp.asarray(blk["ln1"]["scale"]),
            jnp.asarray(blk["ln1"]["bias"]),
            jnp.asarray(blk["qkv"]["kernel"]).astype(dtype),
            jnp.asarray(blk["qkv"]["bias"]).astype(dtype),
            jnp.asarray(blk["proj"]["kernel"]).astype(dtype),
            jnp.asarray(blk["proj"]["bias"]).astype(dtype),
            jnp.ones((da,), dtype), num_heads=hk, scale=scale, eps=eps)
        t = mlp_ln(
            t, jnp.asarray(blk["ln2"]["scale"]),
            jnp.asarray(blk["ln2"]["bias"]),
            jnp.asarray(blk["fc1"]["kernel"]).astype(dtype),
            jnp.asarray(blk["fc1"]["bias"]).astype(dtype),
            jnp.asarray(blk["fc2"]["kernel"]).astype(dtype),
            jnp.asarray(blk["fc2"]["bias"]).astype(dtype),
            jnp.ones((fk,), dtype), eps=eps)

    t = _layer_norm(t, jnp.asarray(top["norm"]["scale"]),
                    jnp.asarray(top["norm"]["bias"]), eps)
    cls = t[:, 0].astype(jnp.float32)
    logits = (cls @ jnp.asarray(top["head"]["kernel"])
              + jnp.asarray(top["head"]["bias"]))
    if cfg.distilled and "head_dist" in top:
        dist = t[:, 1].astype(jnp.float32)
        logits_kd = (dist @ jnp.asarray(top["head_dist"]["kernel"])
                     + jnp.asarray(top["head_dist"]["bias"]))
    else:
        logits_kd = logits
    return ForwardOutput(logits=logits, logits_kd=logits_kd,
                         token_mask=None)


def compact_flops_fraction(layers: List[dict], cfg: ViTConfig,
                           token_ratio: Optional[float] = None) -> float:
    """Fraction of dense FLOPs the compact model actually computes."""
    from uvc_tpu.compress.resource import build_macs_table
    table = build_macs_table(cfg)
    n = cfg.seq_len
    d = cfg.embed_dim
    macs = float(table.embed)
    if token_ratio is not None and token_ratio < 1.0:
        # physical token slimming: prefix tokens + top-k kept patches
        n = (cfg.seq_len - cfg.num_patches) + int(
            token_ratio * cfg.num_patches)
        macs += cfg.num_patches * d                # scorer matmul
    for blk in layers:
        hk_dim = blk["proj"]["kernel"].shape[0]
        fk = blk["fc1"]["kernel"].shape[1]
        macs += n * d * 3 * hk_dim                 # qkv
        macs += n * n * hk_dim * 2                 # qk + av
        macs += n * hk_dim * d                     # proj
        macs += n * d * fk * 2                     # fc1 + fc2
    return 2.0 * macs / float(table.dense_flops)
