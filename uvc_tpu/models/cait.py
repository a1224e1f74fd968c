"""CaiT (Class-Attention in Image Transformers) baseline backbone.

TPU-native re-implementation of the reference baseline model
(Baseline_pruning/cait_models.py): ``depth`` LayerScale blocks with
talking-heads self-attention over patch tokens only (:86-152), then
``cls_attn_layers`` LayerScale class-attention blocks that update the cls
token against the frozen patch tokens (:20-84), classifier on cls (:226-252).

Structure notes:
* talking-heads mixes attention logits across the head axis before AND
  after the softmax (proj_l / proj_w, :119-124) — head mixing between the
  two matmuls rules out the fused per-head attention kernel, so this path
  uses the XLA einsum formulation (the [H, H] mixes are tiny);
* LayerScale: per-channel learned residual scales gamma_1/gamma_2 init
  1e-5 (:141-143);
* pos_embed covers patch tokens only; cls joins after the self-attention
  stack (:226-240).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig
from uvc_tpu.models import vit
from uvc_tpu.models.vit import ForwardOutput, _layer_norm, _trunc_normal


def init_params(key: jax.Array, cfg: ViTConfig, **_ignored) -> dict:
    d, l, f = cfg.embed_dim, cfg.depth, cfg.mlp_hidden
    h = cfg.num_heads
    ca = cfg.cls_attn_layers
    keys = iter(jax.random.split(key, 16))

    def lin(key, fi, fo):
        return {"kernel": _trunc_normal(key, (fi, fo)),
                "bias": jnp.zeros((fo,))}

    def stack(n, fn):
        return jax.vmap(fn)(jax.random.split(next(keys), n))

    params = {
        "patch_embed": {
            "kernel": _trunc_normal(
                next(keys),
                (cfg.patch_size, cfg.patch_size, cfg.in_chans, d)),
            "bias": jnp.zeros((d,)),
        },
        "cls_token": _trunc_normal(next(keys), (1, 1, d)),
        "pos_embed": _trunc_normal(next(keys), (1, cfg.num_patches, d)),
        "blocks": {
            "ln1": {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))},
            "qkv": stack(l, lambda k: lin(k, d, 3 * d)),
            "proj": stack(l, lambda k: lin(k, d, d)),
            "proj_l": stack(l, lambda k: lin(k, h, h)),
            "proj_w": stack(l, lambda k: lin(k, h, h)),
            "ln2": {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))},
            "fc1": stack(l, lambda k: lin(k, d, f)),
            "fc2": stack(l, lambda k: lin(k, f, d)),
            "gamma1": jnp.full((l, d), cfg.layer_scale_init),
            "gamma2": jnp.full((l, d), cfg.layer_scale_init),
        },
        "blocks_ca": {
            "ln1": {"scale": jnp.ones((ca, d)), "bias": jnp.zeros((ca, d))},
            "q": stack(ca, lambda k: lin(k, d, d)),
            "k": stack(ca, lambda k: lin(k, d, d)),
            "v": stack(ca, lambda k: lin(k, d, d)),
            "proj": stack(ca, lambda k: lin(k, d, d)),
            "ln2": {"scale": jnp.ones((ca, d)), "bias": jnp.zeros((ca, d))},
            "fc1": stack(ca, lambda k: lin(k, d, f)),
            "fc2": stack(ca, lambda k: lin(k, f, d)),
            "gamma1": jnp.full((ca, d), cfg.layer_scale_init),
            "gamma2": jnp.full((ca, d), cfg.layer_scale_init),
        },
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "head": {"kernel": jnp.zeros((d, cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,))},
    }
    return params


def _talking_head_attention(x, blk, num_heads, scale, dtype):
    """Attention_talking_head (cait_models.py:86-127): [H, H] logit mixes
    straddle the softmax."""
    b, n, d = x.shape
    hs = d // num_heads
    qkv = (x @ blk["qkv"]["kernel"].astype(dtype)
           + blk["qkv"]["bias"].astype(dtype))
    qkv = qkv.reshape(b, n, 3, num_heads, hs)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.einsum("bhqk,hg->bgqk", logits,
                        blk["proj_l"]["kernel"].astype(jnp.float32)) \
        + blk["proj_l"]["bias"].astype(jnp.float32)[:, None, None]
    attn = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,hg->bgqk", attn,
                      blk["proj_w"]["kernel"].astype(jnp.float32)) \
        + blk["proj_w"]["bias"].astype(jnp.float32)[:, None, None]
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(dtype), v,
                     preferred_element_type=jnp.float32).astype(dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    return (ctx @ blk["proj"]["kernel"].astype(dtype)
            + blk["proj"]["bias"].astype(dtype))


def _class_attention(x_cls, x_all, blk, num_heads, scale, dtype):
    """Class_Attention (cait_models.py:20-54): q from cls only."""
    b, n, d = x_all.shape
    hs = d // num_heads
    q = (x_cls @ blk["q"]["kernel"].astype(dtype)
         + blk["q"]["bias"].astype(dtype)).reshape(b, 1, num_heads, hs)
    k = (x_all @ blk["k"]["kernel"].astype(dtype)
         + blk["k"]["bias"].astype(dtype)).reshape(b, n, num_heads, hs)
    v = (x_all @ blk["v"]["kernel"].astype(dtype)
         + blk["v"]["bias"].astype(dtype)).reshape(b, n, num_heads, hs)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    ctx = ctx.reshape(b, 1, d)
    return (ctx @ blk["proj"]["kernel"].astype(dtype)
            + blk["proj"]["bias"].astype(dtype))


def _mlp(x, blk, dtype):
    h = (x @ blk["fc1"]["kernel"].astype(dtype)
         + blk["fc1"]["bias"].astype(dtype))
    h = jax.nn.gelu(h, approximate=False)
    return (h @ blk["fc2"]["kernel"].astype(dtype)
            + blk["fc2"]["bias"].astype(dtype))


def apply(params: dict, x: jax.Array, cfg: ViTConfig, *,
          rng: Optional[jax.Array] = None, train: bool = False,
          dtype=jnp.float32, **_ignored) -> ForwardOutput:
    """forward_features + head (cait_models.py:226-252).  UVC gating /
    masking args are accepted for API symmetry and ignored — CaiT is a
    baseline comparison model, not on the compression path."""
    eps = cfg.layer_norm_eps
    scale = cfg.head_size ** -0.5
    b = x.shape[0]
    t = vit.patch_embed(params, x, cfg, dtype)       # [B, N, D]
    t = t + params["pos_embed"].astype(dtype)

    def sa_body(carry, blk):
        z = carry
        a = _talking_head_attention(
            _layer_norm(z, blk["ln1"]["scale"], blk["ln1"]["bias"], eps),
            blk, cfg.num_heads, scale, dtype)
        z = z + blk["gamma1"].astype(dtype) * a
        m = _mlp(_layer_norm(z, blk["ln2"]["scale"], blk["ln2"]["bias"],
                             eps), blk, dtype)
        z = z + blk["gamma2"].astype(dtype) * m
        return z, None

    body = jax.checkpoint(sa_body)
    t, _ = jax.lax.scan(body, t, params["blocks"])

    cls = jnp.broadcast_to(params["cls_token"],
                           (b, 1, cfg.embed_dim)).astype(dtype)
    ca = params["blocks_ca"]
    for i in range(cfg.cls_attn_layers):
        blk = jax.tree.map(lambda a: a[i], ca)
        u = jnp.concatenate([cls, t], axis=1)
        un = _layer_norm(u, blk["ln1"]["scale"], blk["ln1"]["bias"], eps)
        a = _class_attention(un[:, :1], un, blk, cfg.num_heads, scale,
                             dtype)
        cls = cls + blk["gamma1"].astype(dtype) * a
        m = _mlp(_layer_norm(cls, blk["ln2"]["scale"], blk["ln2"]["bias"],
                             eps), blk, dtype)
        cls = cls + blk["gamma2"].astype(dtype) * m

    u = jnp.concatenate([cls, t], axis=1)
    u = _layer_norm(u, params["norm"]["scale"], params["norm"]["bias"], eps)
    logits = (u[:, 0].astype(jnp.float32) @ params["head"]["kernel"]
              + params["head"]["bias"])
    return ForwardOutput(logits=logits, logits_kd=logits, token_mask=None)


eval_logits = vit.eval_logits
