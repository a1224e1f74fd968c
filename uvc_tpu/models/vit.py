"""Pure-functional DeiT / ViT backbone, instrumented for UVC.

TPU-native redesign of the reference ``DistilledVisionTransformer``
(UVC/models/model_distilled.py:250-531):

* parameters are a plain pytree with per-block tensors *stacked* along a
  leading layer axis, so the block loop is one ``lax.scan`` — one compiled
  block body regardless of depth, and trivially shardable with pjit;
* the runtime MACs threading of the reference forward is gone — the FLOPs
  table is analytic (uvc_tpu/compress/resource.py);
* block gating / part gating / token selection / patch gating enter the
  forward as explicit arguments (distributions and masks sampled by the
  caller with threaded PRNG keys), never as mutable module attributes;
* structured pruning masks multiply the *activations* feeding the attention
  output projection and MLP fc2 — functionally identical to the reference's
  ``weight * mask`` buffers (see uvc_tpu/compress/masks.py) with tiny
  ``[L, D]`` / ``[L, d_ff]`` masks instead of weight-shaped buffers;
* matmuls run in a configurable compute dtype (bfloat16 on TPU) with
  float32 layer norms and softmax.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from uvc_tpu.configs import ViTConfig
from uvc_tpu.ops.gumbel import (gather_tokens_with_pos, gumbel_topk_mask,
                                physical_topk_indices, token_scores)

# A/B switches for the round-3 fused sublayer kernels (module globals,
# read at trace time — bench.py flips them as a compile-failure fallback
# to the round-2-proven separate-LN kernels)
_FUSED_MLP = os.environ.get("UVC_FUSED_MLP", "1") != "0"
_FUSED_ATTN_LN = os.environ.get("UVC_FUSED_ATTN_LN", "1") != "0"
_FUSED_BLEND = os.environ.get("UVC_FUSED_BLEND", "1") != "0"


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _linear(key, fan_in, fan_out, dtype=jnp.float32):
    wkey, _ = jax.random.split(key)
    return {"kernel": _trunc_normal(wkey, (fan_in, fan_out), 0.02, dtype),
            "bias": jnp.zeros((fan_out,), dtype)}


def _layernorm(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_params(key: jax.Array, cfg: ViTConfig, *,
                patch_gating: bool = False,
                dtype=jnp.float32) -> dict:
    """Initialize a DeiT/ViT parameter pytree.

    Layout (L = depth, D = embed_dim, F = mlp_hidden, N = num_patches,
    T = prefix tokens):

      patch_embed: kernel [P, P, C, D], bias [D]
      cls_token [1, 1, D]; dist_token [1, 1, D] (if distilled)
      pos_embed [1, N+T, D]
      blocks: ln1/ln2 {scale,bias [L, D]}, qkv {kernel [L, D, 3D]},
              proj {kernel [L, D, D]}, fc1 {kernel [L, D, F]},
              fc2 {kernel [L, F, D]} (+ biases)
      norm {scale, bias [D]}; head {kernel [D, classes]};
      head_dist (if distilled)
      block_gating [L, 2]   (init rows [-1, 1]: model_distilled.py:416)
      attn_gating / mlp_gating [L, 2]  (part gating: :213-214)
      token_scorer {kernel [D, 1]}     (the `gumbel` scorer: :409)
      patch_gating [1, N, 1]           (mode 1 only; init 3.0 — the minimax
                                        module overrides the model's zeros
                                        with 3*ones: uvc_utils.py:152)
    """
    keys = iter(jax.random.split(key, 24))
    d, l = cfg.embed_dim, cfg.depth
    f = cfg.mlp_hidden
    p = cfg.patch_size

    def stack(fn):
        return jax.vmap(fn)(jax.random.split(next(keys), l))

    if cfg.hybrid:
        # R50 hybrid: ResNetV2 stem (stride 16) + 1x1 patch conv
        # (modeling.py:186-194)
        from uvc_tpu.models.resnet import init_resnet_stem
        stem_c = 64 * cfg.resnet_width * 16
        pe = {"kernel": _trunc_normal(next(keys), (1, 1, stem_c, d)),
              "bias": jnp.zeros((d,), dtype)}
    else:
        pe = {"kernel": _trunc_normal(next(keys), (p, p, cfg.in_chans, d)),
              "bias": jnp.zeros((d,), dtype)}

    params = {
        "patch_embed": pe,
        "cls_token": _trunc_normal(next(keys), (1, 1, d)),
        "pos_embed": _trunc_normal(next(keys), (1, cfg.seq_len, d)),
        "blocks": {
            "ln1": {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))},
            "qkv": stack(lambda k: _linear(k, d, 3 * d)),
            "proj": stack(lambda k: _linear(k, d, d)),
            "ln2": {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))},
            "fc1": stack(lambda k: _linear(k, d, f)),
            "fc2": stack(lambda k: _linear(k, f, d)),
        },
        "norm": _layernorm(d),
        # classifier head: zero-init like the reference
        # (_init_vit_weights, model_distilled.py:71-74)
        "head": {"kernel": jnp.zeros((d, cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,))},
        "block_gating": jnp.tile(jnp.array([-1.0, 1.0]), (l, 1)),
        "attn_gating": jnp.tile(jnp.array([-1.0, 1.0]), (l, 1)),
        "mlp_gating": jnp.tile(jnp.array([-1.0, 1.0]), (l, 1)),
        "token_scorer": _linear(next(keys), d, 1),
    }
    if cfg.distilled:
        params["dist_token"] = _trunc_normal(next(keys), (1, 1, d))
        params["head_dist"] = {"kernel": jnp.zeros((d, cfg.num_classes)),
                               "bias": jnp.zeros((cfg.num_classes,))}
    if patch_gating:
        params["patch_gating"] = jnp.full((1, cfg.num_patches, 1), 3.0)
    if cfg.hybrid:
        from uvc_tpu.models.resnet import init_resnet_stem
        params["resnet"] = init_resnet_stem(
            next(keys), cfg.resnet_layers, cfg.resnet_width)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attention(x, blk, num_heads, scale, attn_mask_row, dtype):
    from uvc_tpu.ops.attention import layer_attention
    d = x.shape[-1]
    # the whole sublayer (qkv matmul -> multi-head attention -> structural
    # ctx mask [= zeroing proj input columns, uvc_utils.py:381-392] ->
    # output projection) runs as ONE fused Pallas program on TPU: qkv
    # activations and attention probabilities never touch HBM, weights
    # stay VMEM-resident across the batch grid
    mask = attn_mask_row.astype(dtype) if attn_mask_row is not None \
        else jnp.ones((d,), dtype)
    return layer_attention(
        x, blk["qkv"]["kernel"].astype(dtype),
        blk["qkv"]["bias"].astype(dtype),
        blk["proj"]["kernel"].astype(dtype),
        blk["proj"]["bias"].astype(dtype), mask,
        num_heads=num_heads, scale=scale)


def _attention_ln(x, blk, num_heads, scale, attn_mask_row, eps, dtype):
    """x + attention_sublayer(LN1(x)) as ONE fused Pallas program each way
    (fwd and bwd): LN1 and the residual add were the last per-sublayer XLA
    elementwise passes, each a full [B, N, D] HBM round trip (VERDICT r2
    weak #1)."""
    from uvc_tpu.ops.attention import layer_attention_ln
    d = x.shape[-1]
    mask = attn_mask_row.astype(dtype) if attn_mask_row is not None \
        else jnp.ones((d,), dtype)
    return layer_attention_ln(
        x, blk["ln1"]["scale"], blk["ln1"]["bias"],
        blk["qkv"]["kernel"].astype(dtype),
        blk["qkv"]["bias"].astype(dtype),
        blk["proj"]["kernel"].astype(dtype),
        blk["proj"]["bias"].astype(dtype), mask,
        num_heads=num_heads, scale=scale, eps=eps)


def _mlp_ln(x, blk, mlp_mask_row, eps, dtype):
    """x + mlp_sublayer(LN2(x)) as ONE fused Pallas program each way
    (ops/mlp.py): after the attention sublayer fused, the MLP's hidden
    round trips + LN2 + residual were the block's HBM-traffic leader.
    A/B: set UVC_FUSED_MLP=0 to restore the XLA composition (a round-1
    fc1/gelu/fc2-only fusion measured -5%; this version also absorbs
    LN2, the mask, the residual, and the backward — re-measured on-chip
    per round)."""
    from uvc_tpu.ops.mlp import mlp_ln
    f = blk["fc1"]["kernel"].shape[-1]
    mask = mlp_mask_row.astype(dtype) if mlp_mask_row is not None \
        else jnp.ones((f,), dtype)
    return mlp_ln(
        x, blk["ln2"]["scale"], blk["ln2"]["bias"],
        blk["fc1"]["kernel"].astype(dtype),
        blk["fc1"]["bias"].astype(dtype),
        blk["fc2"]["kernel"].astype(dtype),
        blk["fc2"]["bias"].astype(dtype), mask, eps=eps)


def _mlp_ln_blend(x, xin, distrib, blk, mlp_mask_row, eps, dtype):
    """distrib[1]*(x + mlp_sublayer(LN2(x))) + distrib[0]*xin as ONE fused
    Pallas program each way (ops/mlp.py): absorbs the stage-1 block-gating
    blend (reference model_distilled.py:477-507) into the MLP sublayer
    kernel.  The pre-blend block output never reaches HBM and is no longer
    remat-saved ("block_out") — its only backward consumer, the gating
    gradient sum(do*out), is computed in-kernel from VMEM-resident values.
    A/B: UVC_FUSED_BLEND=0 restores the separate XLA blend."""
    from uvc_tpu.ops.mlp import mlp_ln_blend
    f = blk["fc1"]["kernel"].shape[-1]
    mask = mlp_mask_row.astype(dtype) if mlp_mask_row is not None \
        else jnp.ones((f,), dtype)
    d = distrib.astype(jnp.float32)
    return mlp_ln_blend(
        x, xin, d, blk["ln2"]["scale"], blk["ln2"]["bias"],
        blk["fc1"]["kernel"].astype(dtype),
        blk["fc1"]["bias"].astype(dtype),
        blk["fc2"]["kernel"].astype(dtype),
        blk["fc2"]["bias"].astype(dtype), mask, eps=eps)


def _mlp(x, blk, mlp_mask_row, dtype):
    # XLA-composed MLP branch (part-gating / drop-path variants and the
    # UVC_FUSED_MLP=0 A/B path; the default route is _mlp_ln above).
    h = (x @ blk["fc1"]["kernel"].astype(dtype)
         + blk["fc1"]["bias"].astype(dtype))
    # NOTE: name-saving the pre-GELU hidden here (so the replay skips the
    # fc1 matmul) was measured SLOWER (-13% step): materializing [B, N, 4D]
    # per layer costs more HBM bandwidth than the recompute costs MXU time
    # gelu in compute dtype — matches torch AMP autocast, which runs GELU
    # in half precision (the reference trains under autocast/apex O2)
    h = jax.nn.gelu(h, approximate=False)
    if mlp_mask_row is not None:
        # structural MLP-unit pruning: identical to zeroing fc2's input
        # columns + fc1's output rows (uvc_utils.py:394-401).
        h = h * mlp_mask_row.astype(dtype)
    out = (h @ blk["fc2"]["kernel"].astype(dtype)
           + blk["fc2"]["bias"].astype(dtype))
    return out


def patch_embed(params: dict, x: jax.Array, cfg: ViTConfig,
                dtype=jnp.float32) -> jax.Array:
    """Non-overlapping conv patchify as reshape + one big matmul
    (MXU-friendly; equivalent to Conv2d k=s=patch_size).  For the R50
    hybrid, the ResNetV2 stem runs first and the "patch" conv is 1x1
    (modeling.py:184-194)."""
    b = x.shape[0]
    if cfg.hybrid:
        from uvc_tpu.models.resnet import apply_resnet_stem
        feat = apply_resnet_stem(params["resnet"], x.astype(dtype),
                                 cfg.resnet_layers)   # [B, g, g, C']
        g = feat.shape[1]
        c = feat.shape[-1]
        feat = feat.reshape(b, g * g, c)
        kernel = params["patch_embed"]["kernel"].reshape(c, cfg.embed_dim)
        return (feat @ kernel.astype(dtype)
                + params["patch_embed"]["bias"].astype(dtype))
    p = cfg.patch_size
    g = cfg.img_size // p
    # x: [B, H, W, C] (NHWC on TPU)
    x = x.reshape(b, g, p, g, p, cfg.in_chans)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * cfg.in_chans)
    kernel = params["patch_embed"]["kernel"].reshape(
        p * p * cfg.in_chans, cfg.embed_dim)
    return (x.astype(dtype) @ kernel.astype(dtype)
            + params["patch_embed"]["bias"].astype(dtype))


def drop_path(branch: jax.Array, key: jax.Array, rate) -> jax.Array:
    """Stochastic depth on a residual branch (timm DropPath semantics,
    used by the baseline recipe at drop_path=0.1:
    Baseline_pruning/main.py:261-262): drop the whole branch per sample
    with probability ``rate``, scale survivors by 1/(1-rate)."""
    keep = 1.0 - rate
    m = jax.random.bernoulli(key, keep, (branch.shape[0], 1, 1))
    return branch * m.astype(branch.dtype) / jnp.asarray(
        keep, branch.dtype)


class ForwardOutput(NamedTuple):
    logits: jax.Array
    logits_kd: jax.Array       # distillation-head logits (== logits when
                               # no dist head: model_distilled.py:523-525)
    token_mask: Optional[jax.Array]


def apply(params: dict, x: jax.Array, cfg: ViTConfig, *,
          gating_distrib: Optional[jax.Array] = None,
          attn_distrib: Optional[jax.Array] = None,
          mlp_distrib: Optional[jax.Array] = None,
          masks: Optional[Dict[str, jax.Array]] = None,
          tau: float = -1.0,
          patch_ratio: float = 0.9,
          patch_gate_mode: int = 0,
          patch_hard: bool = False,
          patch_physical: bool = False,
          jumping: bool = False,
          rng: Optional[jax.Array] = None,
          train: bool = False,
          drop_path_rate: float = 0.0,
          dtype=jnp.float32) -> ForwardOutput:
    """Forward pass (reference forward_features + heads:
    model_distilled.py:429-531).

    Args:
      gating_distrib: ``[L, 2]`` per-block (skip, keep) distribution; None
        runs the ungated residual blocks.
      attn_distrib / mlp_distrib: ``[L, 2]`` part-gating distributions
        (reference Block part gating :218-234); None disables.
      masks: structural keep masks {"attn": [L, D], "mlp": [L, F]} or None.
      tau: token-selection temperature; > 0 enables learned gumbel top-k
        token slimming keeping ``floor(patch_ratio * N)`` tokens (:446-456).
      patch_gate_mode: 1 applies the sigmoid patch gate (:434-444).
      jumping: accumulate every block's output into the final representation
        (:502-506).
      rng: PRNG key for gumbel token sampling; None selects the
        deterministic noise-free top-k (serving semantics, matching the
        physical token drop in infer/compact.py).
      patch_physical: with deterministic token selection (rng=None), GATHER
        the kept tokens instead of zero-masking them — the sequence axis
        really shrinks to ``k + prefix``, exactly the serving artifact's
        semantics (infer/compact.py apply_compact).  The masked path leaves
        dropped tokens behind as positional "ghost" rows (zeroed before the
        pos-embed add) that still attend and absorb softmax mass; on the
        hardened r4 e2e task that semantic mismatch between stage-2
        fine-tuning and compact serving cost 2.35 accuracy points (gate A7),
        so stage 2 trains and validates physically.  The kept set is
        identical either way (topk_token_mask boosts token 0's score, this
        path pins it to +inf).  ~30% cheaper at ratio 0.7, too.
    """
    eps = cfg.layer_norm_eps
    b = x.shape[0]
    x = patch_embed(params, x, cfg, dtype)  # [B, N, D]

    if patch_gate_mode == 1 and "patch_gating" in params:
        gate = jax.nn.sigmoid(params["patch_gating"]).astype(dtype)
        if patch_hard:
            hard = (gate >= 0.5).astype(dtype)
            hard = hard.at[:, 0].set(1.0)
            x = x * hard
        else:
            x = x * gate

    token_mask = None
    # token selection must be a *static* decision (tau is traced when the
    # schedule anneals it inside jit: joint_train.py:399-407) — mode 2 turns
    # it on; a concrete positive tau also works for direct callers.
    token_select = (patch_gate_mode == 2
                    or (isinstance(tau, (int, float)) and tau > 0))
    physical = token_select and patch_physical and rng is None
    idx = None
    if token_select:
        k = int(patch_ratio * cfg.num_patches)
        scores = token_scores(x, params["token_scorer"])  # [B, N]
        if physical:
            # serving-exact: gather the kept tokens (infer/compact.py
            # apply_compact runs the SAME shared helpers)
            idx = physical_topk_indices(scores, k)  # [B, k]
        elif rng is None:
            # deterministic noise-free top-k, ghost rows retained (the
            # reference-style masked serving: model_distilled.py:446-456)
            from uvc_tpu.ops.gumbel import topk_token_mask
            token_mask = topk_token_mask(scores, k)
        else:
            token_mask = gumbel_topk_mask(rng, scores, k, tau)
        if token_mask is not None:
            x = x * token_mask[..., None].astype(dtype)

    tokens = [jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim)
                               ).astype(dtype)]
    if cfg.distilled:
        tokens.append(jnp.broadcast_to(
            params["dist_token"], (b, 1, cfg.embed_dim)).astype(dtype))
    if physical:
        x = gather_tokens_with_pos(x, idx, tokens, params["pos_embed"],
                                   dtype)
    else:
        x = jnp.concatenate(tokens + [x], axis=1)
        x = x + params["pos_embed"].astype(dtype)

    dp_rate = drop_path_rate if (train and drop_path_rate > 0) else 0.0
    x = transformer_encode(
        params, x, cfg, gating_distrib=gating_distrib,
        attn_distrib=attn_distrib, mlp_distrib=mlp_distrib, masks=masks,
        jumping=jumping, drop_path_rate=dp_rate,
        rng=(jax.random.fold_in(rng, 7) if rng is not None else None),
        dtype=dtype)

    cls = x[:, 0].astype(jnp.float32)
    logits = cls @ params["head"]["kernel"] + params["head"]["bias"]
    if cfg.distilled:
        dist = x[:, 1].astype(jnp.float32)
        logits_kd = (dist @ params["head_dist"]["kernel"]
                     + params["head_dist"]["bias"])
    else:
        logits_kd = logits
    return ForwardOutput(logits=logits, logits_kd=logits_kd,
                         token_mask=token_mask)


def transformer_encode(params: dict, x: jax.Array, cfg: ViTConfig, *,
                       gating_distrib=None, attn_distrib=None,
                       mlp_distrib=None, masks=None, jumping: bool = False,
                       remat: bool = True, drop_path_rate: float = 0.0,
                       rng: Optional[jax.Array] = None,
                       dtype=jnp.float32) -> jax.Array:
    """The gated block stack + final LN, shared by DeiT/ViT and T2T-ViT
    (reference block loops: model_distilled.py:477-507,
    T2TViT/models/t2t_vit.py:177-199).

    ``remat`` checkpoints each block of the scan: activations are recomputed
    in the backward pass, bounding train-step HBM by one block's activations
    instead of all L (the standard TPU memory/FLOPs trade).

    ``drop_path_rate > 0`` enables stochastic depth (timm DropPath; the
    baseline DeiT recipe trains with 0.1: Baseline_pruning/main.py:56,
    :261-262): each residual branch is dropped per sample with a
    linearly-increasing per-layer rate and the kept branches are scaled by
    1/keep.  Requires ``rng``."""
    eps = cfg.layer_norm_eps
    scale = cfg.qk_scale if cfg.qk_scale is not None else cfg.head_size ** -0.5

    use_dp = drop_path_rate > 0.0
    if use_dp:
        if rng is None:
            raise ValueError("drop_path_rate > 0 requires rng")
        dp_keys = jax.random.split(rng, cfg.depth)          # [L, key]
        dp_rates = jnp.linspace(0.0, drop_path_rate, cfg.depth)
    else:
        dp_keys = dp_rates = None

    def block_body(carry, inp):
        h, accum = carry if jumping else (carry, None)
        blk, distrib, a_d, m_d, attn_m, mlp_m, dp_key, dp_rate = inp

        def attn_sub(z):
            if a_d is None and not use_dp and _FUSED_ATTN_LN:
                # LN1 + sublayer + residual as one fused program; the remat
                # name moves to the post-residual sum, so the backward
                # replay skips the attention sublayer AND the residual add
                z = _attention_ln(z, blk, cfg.num_heads, scale, attn_m,
                                  eps, dtype)
                z = checkpoint_name(z, "attn_out")
            else:
                # branch-gated variants (part gating / drop-path) scale the
                # sublayer output before the add — keep the separate-LN path
                a_in = _layer_norm(z, blk["ln1"]["scale"],
                                   blk["ln1"]["bias"], eps)
                a_out = _attention(a_in, blk, cfg.num_heads, scale, attn_m,
                                   dtype)
                # named for the remat policy below: saving the sublayer
                # output lets the backward replay skip the fused attention
                # forward entirely (the Pallas call is dead code in the
                # replay and DCE'd)
                a_out = checkpoint_name(a_out, "attn_out")
                if use_dp:
                    a_out = drop_path(a_out, jax.random.fold_in(dp_key, 0),
                                      dp_rate.astype(jnp.float32))
                if a_d is not None:
                    z = (a_d[0].astype(dtype) * z
                         + a_d[1].astype(dtype) * a_out)
                else:
                    z = z + a_out
            return z

        def mlp_sub(z):
            if m_d is None and not use_dp and _FUSED_MLP:
                z = _mlp_ln(z, blk, mlp_m, eps, dtype)
            else:
                m_in = _layer_norm(z, blk["ln2"]["scale"],
                                   blk["ln2"]["bias"], eps)
                m_out = _mlp(m_in, blk, mlp_m, dtype)
                if m_d is not None:
                    # part-gating gradient d/d(m_d[1]) = sum(do*m_out):
                    # save the sublayer output or the replay re-runs
                    # fc1+gelu+fc2 (same reasoning as "block_out" below)
                    m_out = checkpoint_name(m_out, "mlp_out")
                if use_dp:
                    m_out = drop_path(m_out, jax.random.fold_in(dp_key, 1),
                                      dp_rate.astype(jnp.float32))
                if m_d is not None:
                    z = (m_d[0].astype(dtype) * z
                         + m_d[1].astype(dtype) * m_out)
                else:
                    z = z + m_out
            return z

        z_attn = attn_sub(h)
        if (distrib is not None and m_d is None and not use_dp
                and _FUSED_MLP and _FUSED_BLEND):
            # block-gated hot path: MLP sublayer + gating blend as one
            # fused program each way.  The pre-blend block output never
            # materializes, so no "block_out" remat save either — the
            # gating gradient sum(do*out) is rebuilt in-kernel (see
            # ops/mlp.py _mlp_ln_blend_bwd_kernel)
            h = _mlp_ln_blend(z_attn, h, distrib, blk, mlp_m, eps, dtype)
        else:
            out = mlp_sub(z_attn)
            if distrib is not None:
                # separate-blend fallback (UVC_FUSED_BLEND=0 / part-gated /
                # drop-path variants): the blend's gating gradient
                # d(loss)/d(distrib[1]) = sum(do*out) needs the block
                # output in the backward; without saving it the remat
                # replay re-runs the ENTIRE fused MLP forward kernel per
                # block (~56% of a block's forward FLOPs) just to rebuild
                # `out`.  Naming it costs no HBM traffic — the MLP kernel
                # already wrote it; saving only keeps it alive.
                out = checkpoint_name(out, "block_out")
                h = (distrib[1].astype(dtype) * out
                     + distrib[0].astype(dtype) * h)
            else:
                h = out
        if jumping:
            # accumulate every block's output (model_distilled.py:502-506);
            # the accumulator is only carried when jumping is on — it costs
            # an extra activation read+write per block otherwise
            return (h, accum + h), None
        return h, None

    xs = (params["blocks"], gating_distrib, attn_distrib, mlp_distrib,
          None if masks is None else masks["attn"],
          None if masks is None else masks["mlp"],
          dp_keys, dp_rates)
    # remat policy: keep each block's attention-sublayer output ([B, N, D]
    # per layer — ~40 MB/layer at DeiT-Small B=256) so the backward replay
    # recomputes only layernorms + the MLP linearization points, never the
    # attention sublayer; its own VJP recomputes the softmax exactly once
    # inside the combined backward kernel (ops/attention.py _bwd_ctx_kernel)
    policy = jax.checkpoint_policies.save_only_these_names(
        "attn_out", "block_out", "mlp_out")
    body = jax.checkpoint(block_body, policy=policy) if remat else block_body
    init = (x, jnp.zeros_like(x)) if jumping else x
    out_carry, _ = jax.lax.scan(body, init, xs)
    x = out_carry[1] if jumping else out_carry

    return _layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                       eps)


def eval_logits(out: ForwardOutput, cfg: ViTConfig) -> jax.Array:
    """Inference head fusion: average of cls and dist predictions for
    distilled models (model_distilled.py:530-531)."""
    if cfg.distilled:
        return (out.logits + out.logits_kd) / 2.0
    return out.logits
