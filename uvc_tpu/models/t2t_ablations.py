"""T2T-ViT architecture-ablation zoo: SE, Ghost, Dense variants.

Reference: UVC/T2TViT/models/t2t_vit_se.py, t2t_vit_ghost.py,
t2t_vit_dense.py — the upstream T2T paper's architecture ablations
("not on the UVC path", SURVEY.md §2.2; carried here for full model-zoo
parity).  All three reuse the tokens-to-token stem and fixed sinusoid
position embedding from models/t2t_vit.py; block structures differ enough
from the homogeneous scan that each variant runs an unrolled per-layer
forward:

* SE (t2t_vit_se.py:22-87): squeeze-excitation after the attention
  projection — token-mean, C -> C/16 -> C bottleneck, sigmoid channel
  gate;
* Ghost (t2t_vit_ghost.py:24-110): half-width q/k/v completed by "cheap"
  depthwise 1x1 convs (== per-channel scalar weights), and a ghost MLP
  producing [x1, cheap2(x1), cheap3(x1)] -> fc2(3C -> C);
* Dense (t2t_vit_dense.py:23-110): DenseNet-style channel growth —
  each block appends a growth_rate-wide projection of its output to its
  input, with width-halving transitions between stages.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig
from uvc_tpu.models import vit
from uvc_tpu.models.t2t_vit import init_params as t2t_init
from uvc_tpu.models.t2t_vit import sinusoid_pos_embed, t2t_stem
from uvc_tpu.models.vit import ForwardOutput, _layer_norm, _trunc_normal


def _lin(key, fi, fo, bias=True):
    p = {"kernel": _trunc_normal(key, (fi, fo))}
    p["bias"] = jnp.zeros((fo,)) if bias else None
    return p


def _apply_lin(p, x, dtype):
    y = x @ p["kernel"].astype(dtype)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(dtype)
    return y


def _ln(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _mlp_init(key, d, f):
    k1, k2 = jax.random.split(key)
    return {"fc1": _lin(k1, d, f), "fc2": _lin(k2, f, d)}


def _mlp_apply(p, x, dtype):
    h = jax.nn.gelu(_apply_lin(p["fc1"], x, dtype), approximate=False)
    return _apply_lin(p["fc2"], h, dtype)


def _attn_apply(p, x, num_heads, scale, dtype):
    from uvc_tpu.ops.attention import attention_core
    b, n, d = x.shape
    hs = d // num_heads
    qkv = _apply_lin(p["qkv"], x, dtype).reshape(b, n, 3, num_heads, hs)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ctx = attention_core(q, k, v, scale).astype(dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    return _apply_lin(p["proj"], ctx, dtype)


# ---------------------------------------------------------------------------
# SE variant
# ---------------------------------------------------------------------------


def _se_init(key, d, reduction=16):
    k1, k2 = jax.random.split(key)
    return {"fc1": _lin(k1, d, max(d // reduction, 1), bias=False),
            "fc2": _lin(k2, max(d // reduction, 1), d, bias=False)}


def _se_apply(p, x, dtype):
    """SELayer (t2t_vit_se.py:22-41): token-mean -> bottleneck ->
    sigmoid channel gate."""
    y = jnp.mean(x.astype(jnp.float32), axis=1)          # [B, C]
    y = jax.nn.relu(y @ p["fc1"]["kernel"].astype(jnp.float32))
    y = jax.nn.sigmoid(y @ p["fc2"]["kernel"].astype(jnp.float32))
    return x * y[:, None, :].astype(dtype)


# ---------------------------------------------------------------------------
# Ghost variant
# ---------------------------------------------------------------------------


def _ghost_attn_init(key, d, qkv_bias=False):
    ks = jax.random.split(key, 8)
    half = d // 2
    return {
        "q": _lin(ks[0], d, half, bias=qkv_bias),
        "k": _lin(ks[1], d, half, bias=qkv_bias),
        "v": _lin(ks[2], d, half, bias=qkv_bias),
        # Conv1d(k=1, groups=C) == per-channel scalar weight
        "cheap_q": jnp.ones((half,)),
        "cheap_k": jnp.ones((half,)),
        "cheap_v": jnp.ones((half,)),
        "proj": _lin(ks[3], d, d),
    }


def _ghost_attn_apply(p, x, num_heads, scale, dtype):
    """Attention_ghost (t2t_vit_ghost.py:56-98): half-dim projections
    completed by cheap per-channel ops, concatenated to full width."""
    from uvc_tpu.ops.attention import attention_core
    b, n, d = x.shape
    hs = d // num_heads
    q = _apply_lin(p["q"], x, dtype)
    k = _apply_lin(p["k"], x, dtype)
    v = _apply_lin(p["v"], x, dtype)
    q = jnp.concatenate([q, q * p["cheap_q"].astype(dtype)], axis=-1)
    k = jnp.concatenate([k, k * p["cheap_k"].astype(dtype)], axis=-1)
    v = jnp.concatenate([v, v * p["cheap_v"].astype(dtype)], axis=-1)
    q = q.reshape(b, n, num_heads, hs).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, num_heads, hs).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, num_heads, hs).transpose(0, 2, 1, 3)
    ctx = attention_core(q, k, v, scale).astype(dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    return _apply_lin(p["proj"], ctx, dtype)


def _ghost_mlp_init(key, d, f):
    k1, k2 = jax.random.split(key)
    return {"fc1": _lin(k1, d, d), "cheap2": jnp.ones((d,)),
            "cheap3": jnp.ones((d,)), "fc2": _lin(k2, 3 * d, d)}


def _ghost_mlp_apply(p, x, dtype):
    """Mlp_ghost (t2t_vit_ghost.py:24-55)."""
    x1 = jax.nn.gelu(_apply_lin(p["fc1"], x, dtype), approximate=False)
    x2 = jax.nn.gelu(x1 * p["cheap2"].astype(dtype), approximate=False)
    x3 = jax.nn.gelu(x1 * p["cheap3"].astype(dtype), approximate=False)
    return _apply_lin(p["fc2"], jnp.concatenate([x1, x2, x3], -1), dtype)


# ---------------------------------------------------------------------------
# init / apply
# ---------------------------------------------------------------------------


def dense_plan(cfg: ViTConfig):
    """Deterministic (kind, dim) sequence for the dense variant — kept OUT
    of the params pytree (string/int leaves break jax.tree.map/grad)."""
    plan = []
    dim = cfg.embed_dim
    for si, n_layers in enumerate(cfg.dense_block_config):
        for _ in range(n_layers):
            plan.append(("block", dim))
            dim += cfg.growth_rate
        if si != len(cfg.dense_block_config) - 1:
            plan.append(("transition", dim))
            dim //= 2
    return plan, dim


def init_params(key: jax.Array, cfg: ViTConfig, **_ignored) -> dict:
    d, l, f = cfg.embed_dim, cfg.depth, cfg.mlp_hidden
    base = t2t_init(key, cfg)
    keys = iter(jax.random.split(jax.random.fold_in(key, 7), 256))
    variant = cfg.t2t_variant

    if variant in ("se", "ghost"):
        blocks = []
        for i in range(l):
            blk = {"ln1": _ln(d), "ln2": _ln(d)}
            if variant == "se":
                blk["qkv"] = _lin(next(keys), d, 3 * d, bias=cfg.qkv_bias)
                blk["proj"] = _lin(next(keys), d, d)
                blk["se"] = _se_init(next(keys), d)
                blk["mlp"] = _mlp_init(next(keys), d, f)
            else:
                blk.update(_ghost_attn_init(next(keys), d, cfg.qkv_bias))
                blk["mlp"] = _ghost_mlp_init(next(keys), d, f)
            blocks.append(blk)
        base["ablation_blocks"] = blocks
        del base["blocks"]
        return base

    # dense: growing dims with transitions (t2t_vit_dense.py:81-110)
    plan, final_dim = dense_plan(cfg)
    blocks: List[dict] = []
    for kind, dim in plan:
        if kind == "transition":
            blocks.append({"lin": _lin(next(keys), dim, dim // 2)})
            continue
        blocks.append({
            "ln1": _ln(dim),
            "qkv": _lin(next(keys), dim, 3 * dim, bias=cfg.qkv_bias),
            "proj": _lin(next(keys), dim, dim),
            "ln2": _ln(dim),
            "mlp": _mlp_init(next(keys), dim, int(dim * cfg.mlp_ratio)),
            "dense_linear": _lin(next(keys), dim, cfg.growth_rate),
        })
    base["ablation_blocks"] = blocks
    base["norm"] = _ln(final_dim)
    base["head"] = {"kernel": jnp.zeros((final_dim, cfg.num_classes)),
                    "bias": jnp.zeros((cfg.num_classes,))}
    del base["blocks"]
    return base


def apply(params: dict, x: jax.Array, cfg: ViTConfig, *,
          rng=None, train: bool = False, dtype=jnp.float32,
          **_ignored) -> ForwardOutput:
    eps = cfg.layer_norm_eps
    b = x.shape[0]
    t = t2t_stem(params, x, cfg, dtype)
    cls = jnp.broadcast_to(params["cls_token"],
                           (b, 1, cfg.embed_dim)).astype(dtype)
    t = jnp.concatenate([cls, t], axis=1)
    pos = jnp.asarray(sinusoid_pos_embed(cfg.num_patches + 1,
                                         cfg.embed_dim))
    t = t + pos.astype(dtype)

    variant = cfg.t2t_variant
    scale_for = lambda dim: (cfg.qk_scale if cfg.qk_scale is not None  # noqa
                             else (dim // cfg.num_heads) ** -0.5)

    plan = None
    if variant == "dense":
        plan, _ = dense_plan(cfg)
    for li, blk in enumerate(params["ablation_blocks"]):
        if variant == "dense" and plan[li][0] == "transition":
            t = jax.nn.gelu(_apply_lin(blk["lin"], t, dtype),
                            approximate=False)
            continue
        dim = t.shape[-1]
        z = _layer_norm(t, blk["ln1"]["scale"], blk["ln1"]["bias"], eps)
        if variant == "ghost":
            a = _ghost_attn_apply(blk, z, cfg.num_heads, scale_for(dim),
                                  dtype)
        else:
            a = _attn_apply(blk, z, cfg.num_heads, scale_for(dim), dtype)
            if variant == "se":
                a = _se_apply(blk["se"], a, dtype)
        t2 = t + a
        z = _layer_norm(t2, blk["ln2"]["scale"], blk["ln2"]["bias"], eps)
        if variant == "ghost":
            m = _ghost_mlp_apply(blk["mlp"], z, dtype)
        else:
            m = _mlp_apply(blk["mlp"], z, dtype)
        new_t = t2 + m
        if variant == "dense":
            g = _apply_lin(blk["dense_linear"], new_t, dtype)
            t = jnp.concatenate([t, g], axis=-1)
        else:
            t = new_t

    t = _layer_norm(t, params["norm"]["scale"], params["norm"]["bias"], eps)
    logits = (t[:, 0].astype(jnp.float32) @ params["head"]["kernel"]
              + params["head"]["bias"])
    return ForwardOutput(logits=logits, logits_kd=logits, token_mask=None)


eval_logits = vit.eval_logits
