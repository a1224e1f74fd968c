"""T2T-ViT backbone family (performer / transformer tokens-to-token stem).

TPU-native re-implementation of the vendored reference models
(UVC/T2TViT/models/t2t_vit.py, token_performer.py, token_transformer.py):

* three soft-splits (7/4/2, 3/2/1, 3/2/1) interleaved with two token
  attention stages and a final projection (t2t_vit.py:46-105);
* the transformer encoder reuses the same stacked-block scan, gating and
  masking machinery as DeiT (uvc_tpu/models/vit.py transformer_encode), so
  the entire compression engine works on T2T-ViT unchanged;
* fixed sinusoid position embeddings (t2t_vit.py:120, requires_grad=False)
  are computed as a constant, not stored as a parameter — nothing to freeze;
* the performer's random-feature matrix ``w`` is a non-trainable constant
  carried in the params tree; ``frozen_param_paths`` lists it so train steps
  zero its gradient (torch sets requires_grad=False:
  token_performer.py:28-29).

Soft splits use ``lax.conv_general_dilated_patches`` — one XLA op per
unfold, feature order (c, kh, kw) matching ``nn.Unfold`` for checkpoint
compatibility.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import ViTConfig
from uvc_tpu.models import vit
from uvc_tpu.models.vit import ForwardOutput, _layer_norm


FROZEN_PARAM_SUFFIXES = ("prm_w",)


@functools.lru_cache(maxsize=8)
def sinusoid_pos_embed(n_position: int, d_hid: int) -> np.ndarray:
    """get_sinusoid_encoding (transformer_block.py:115-125)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


def _unfold(x: jax.Array, k: int, s: int, p: int) -> jax.Array:
    """nn.Unfold: [B, H, W, C] -> [B, L, C*k*k] with (c, kh, kw) feature
    order.

    Implemented with explicit strided slices (a pure gather) rather than
    ``conv_general_dilated_patches``: on TPU the conv formulation executes
    as a real convolution at default (bf16-pass) precision, injecting
    ~1e-2 noise into what should be an exact data movement."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    oh = (h + 2 * p - k) // s + 1
    ow = (w + 2 * p - k) // s + 1
    rows = []
    for ki in range(k):
        cols = []
        for kj in range(k):
            cols.append(jax.lax.slice(
                x, (0, ki, kj, 0),
                (b, ki + (oh - 1) * s + 1, kj + (ow - 1) * s + 1, c),
                (1, s, s, 1)))                       # [B, oh, ow, C]
        rows.append(jnp.stack(cols, axis=-1))        # [B, oh, ow, C, k]
    pat = jnp.stack(rows, axis=-2)                   # [B, oh, ow, C, k, k]
    return pat.reshape(b, oh * ow, c * k * k)


def _unfold_klast(x: jax.Array, k: int, s: int, p: int) -> jax.Array:
    """Patch gather in (kh, kw, c) feature order: each of the k^2 strided
    slices lands as one CONTIGUOUS c-wide feature chunk, unlike nn.Unfold's
    (c, kh, kw) order whose interleaved scatter writes at k-element
    granularity (3 of 128 vector lanes for these stems — measured ~20
    ms/step across the three stem unfolds).  Consumers permute their
    weight rows once via _klast_perm instead."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    oh = (h + 2 * p - k) // s + 1
    ow = (w + 2 * p - k) // s + 1
    pieces = []
    for ki in range(k):
        for kj in range(k):
            pieces.append(jax.lax.slice(
                x, (0, ki, kj, 0),
                (b, ki + (oh - 1) * s + 1, kj + (ow - 1) * s + 1, c),
                (1, s, s, 1)))
    return jnp.concatenate(pieces, axis=-1).reshape(b, oh * ow, k * k * c)


def _klast_perm(k: int, c: int) -> np.ndarray:
    """feat_idx mapping a (kh, kw, c) slot to its nn.Unfold (c, kh, kw)
    weight row: slot (ki*k + kj)*c + ch  ->  row ch*k^2 + ki*k + kj."""
    idx = np.empty((k * k * c,), np.int32)
    for ki in range(k):
        for kj in range(k):
            for ch in range(c):
                idx[(ki * k + kj) * c + ch] = ch * k * k + ki * k + kj
    return idx


def _init_linear(key, fan_in, fan_out):
    return {"kernel": 0.02 * jax.random.truncated_normal(
        key, -2.0, 2.0, (fan_in, fan_out)),
        "bias": jnp.zeros((fan_out,))}


def init_performer(key: jax.Array, dim: int, emb: int,
                   kernel_ratio: float = 0.5) -> dict:
    """Token_performer params (token_performer.py:8-29)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m = int(emb * kernel_ratio)
    w = jax.random.normal(k5, (m, emb))
    # orthogonal init * sqrt(m) (token_performer.py:28-29)
    q, _ = jnp.linalg.qr(w.T)
    w = q.T * math.sqrt(m)
    return {
        "kqv": _init_linear(k1, dim, 3 * emb),
        "proj": _init_linear(k2, emb, emb),
        "norm1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "norm2": {"scale": jnp.ones((emb,)), "bias": jnp.zeros((emb,))},
        "mlp_fc1": _init_linear(k3, emb, emb),
        "mlp_fc2": _init_linear(k4, emb, emb),
        "prm_w": w,
    }


def apply_performer(p: dict, x: jax.Array, *, eps: float = 1e-5,
                    dtype=jnp.float32) -> jax.Array:
    """Token_performer forward (token_performer.py:31-69), dropout-free
    (dp=0.1 in the reference; UVC fine-tunes from pretrained stems where
    eval-mode equivalence is what matters).

    On accelerators the whole stage runs as fused Pallas programs
    (ops/performer.py — LN/kqv/random-features/linear-attention/proj/MLP
    with a custom two-pass VJP); the composed XLA path below is the CPU
    and odd-shape fallback, and the kernel's numerical oracle."""
    if jax.default_backend() != "cpu":
        from uvc_tpu.ops.performer import fused_performer
        out = fused_performer(p, x, dtype=dtype)
        if out is not None:
            return out
    emb = p["proj"]["kernel"].shape[0]
    m = p["prm_w"].shape[0]
    w = jax.lax.stop_gradient(p["prm_w"]).astype(jnp.float32)

    def prm_exp(t):
        # exp in f32 for range safety, but the [B, N, m] feature map is
        # materialized in the compute dtype: at stage-1 shape (N=3136)
        # the f32 version cost ~200 MB of HBM per map, and this chain is
        # bandwidth-bound (the reference trains under torch autocast,
        # which runs these matmuls in fp16 anyway)
        t32 = t.astype(jnp.float32)
        xd = jnp.sum(t32 * t32, axis=-1, keepdims=True) / 2.0
        wtx = jnp.einsum("bti,mi->btm", t32, w,
                         preferred_element_type=jnp.float32)
        return (jnp.exp(wtx - xd) / math.sqrt(m)).astype(dtype)

    xn = _layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], 1e-5)
    kqv = (xn @ p["kqv"]["kernel"].astype(dtype)
           + p["kqv"]["bias"].astype(dtype))
    k, q, v = jnp.split(kqv, 3, axis=-1)
    kp, qp = prm_exp(k), prm_exp(q)
    d = jnp.einsum("bti,bi->bt", qp,
                   kp.astype(jnp.float32).sum(axis=1).astype(dtype),
                   preferred_element_type=jnp.float32)[..., None]
    kptv = jnp.einsum("bin,bim->bnm", v, kp,
                      preferred_element_type=jnp.float32)
    # the divide + downcast fuse into the einsum epilogue: only the bf16
    # y ever reaches HBM
    y = (jnp.einsum("bti,bni->btn", qp, kptv.astype(dtype),
                    preferred_element_type=jnp.float32)
         / (d + 1e-8)).astype(dtype)
    attn_out = v + (y @ p["proj"]["kernel"].astype(dtype)
                    + p["proj"]["bias"].astype(dtype))
    h = _layer_norm(attn_out, p["norm2"]["scale"], p["norm2"]["bias"], 1e-5)
    h = (h @ p["mlp_fc1"]["kernel"].astype(dtype)
         + p["mlp_fc1"]["bias"].astype(dtype))
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dtype)
    h = (h @ p["mlp_fc2"]["kernel"].astype(dtype)
         + p["mlp_fc2"]["bias"].astype(dtype))
    return attn_out + h


def init_token_transformer(key: jax.Array, dim: int, in_dim: int) -> dict:
    """Token_transformer params (token_transformer.py:13-60),
    num_heads=1, mlp_ratio=1."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "qkv": _init_linear(k1, dim, 3 * in_dim),
        "proj": _init_linear(k2, in_dim, in_dim),
        "norm1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "norm2": {"scale": jnp.ones((in_dim,)), "bias": jnp.zeros((in_dim,))},
        "mlp_fc1": _init_linear(k3, in_dim, in_dim),
        "mlp_fc2": _init_linear(k4, in_dim, in_dim),
    }


def apply_token_transformer(p: dict, x: jax.Array, dim: int,
                            dtype=jnp.float32) -> jax.Array:
    in_dim = p["proj"]["kernel"].shape[0]
    # reference: head_dim = dim // num_heads (=dim), scale = head_dim**-0.5
    scale = dim ** -0.5
    xn = _layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], 1e-5)
    qkv = (xn @ p["qkv"]["kernel"].astype(dtype)
           + p["qkv"]["bias"].astype(dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)   # each [B, N, in_dim]
    logits = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    ctx = jnp.einsum("bqk,bkd->bqd", attn, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    out = (ctx @ p["proj"]["kernel"].astype(dtype)
           + p["proj"]["bias"].astype(dtype))
    x = v + out   # v-residual (token_transformer.py:41)
    h = _layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], 1e-5)
    h = (h @ p["mlp_fc1"]["kernel"].astype(dtype)
         + p["mlp_fc1"]["bias"].astype(dtype))
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dtype)
    h = (h @ p["mlp_fc2"]["kernel"].astype(dtype)
         + p["mlp_fc2"]["bias"].astype(dtype))
    return x + h


def init_params(key: jax.Array, cfg: ViTConfig, **_ignored) -> dict:
    """T2T-ViT parameter pytree: 't2t' stem + the standard stacked blocks
    (so compression machinery applies unchanged).  Extra kwargs (e.g.
    ``patch_gating``) are accepted for signature parity with vit and
    ignored — the reference T2T path has no patch gating
    (t2t_vit.py:168-208)."""
    kd, ks, k1, k2, k3, kc = jax.random.split(key, 6)
    d = cfg.embed_dim
    td = cfg.token_dim
    base = vit.init_params(kd, cfg)
    del base["patch_embed"]
    del base["pos_embed"]      # fixed sinusoid, computed in apply
    del base["token_scorer"]
    base.pop("dist_token", None)
    base.pop("head_dist", None)
    if cfg.tokens_type == "performer":
        stem = {
            "attention1": init_performer(k1, cfg.in_chans * 7 * 7, td),
            "attention2": init_performer(k2, td * 3 * 3, td),
        }
    else:
        stem = {
            "attention1": init_token_transformer(k1, cfg.in_chans * 7 * 7,
                                                 td),
            "attention2": init_token_transformer(k2, td * 3 * 3, td),
        }
    stem["project"] = _init_linear(k3, td * 3 * 3, d)
    base["t2t"] = stem
    base["cls_token"] = 0.02 * jax.random.truncated_normal(
        kc, -2.0, 2.0, (1, 1, d))
    return base


def t2t_stem(params: dict, x: jax.Array, cfg: ViTConfig,
             dtype=jnp.float32) -> jax.Array:
    """Tokens-to-token encoding (t2t_vit.py:84-105): [B,H,W,C] -> [B,N,D]."""
    stem = params["t2t"]
    b = x.shape[0]
    g0 = cfg.img_size // 4

    def stage(p, t):
        if cfg.tokens_type == "performer":
            return apply_performer(p, t, dtype=dtype)
        return apply_token_transformer(p, t, t.shape[-1], dtype=dtype)

    t = None
    if cfg.tokens_type == "performer" and jax.default_backend() != "cpu":
        # stage-1 fast path: space-to-depth neighborhood + slot-scattered
        # kqv weights instead of the 3-channel-granularity nn.Unfold
        # gather (ops/performer.py s2d_stage1_inputs; ~20 ms/step saved)
        from uvc_tpu.ops.performer import (fused_performer,
                                           s2d_stage1_inputs)
        xs, feat_idx = s2d_stage1_inputs(x.astype(dtype))
        if xs is not None:
            t = fused_performer(stem["attention1"], xs, dtype=dtype,
                                feat_idx=feat_idx)
    if t is None:
        t = _unfold(x.astype(dtype), 7, 4, 2)          # [B, g0^2, 147]
        t = stage(stem["attention1"], t)
    t = t.reshape(b, g0, g0, -1)
    td = t.shape[-1]
    fast2 = None
    if cfg.tokens_type == "performer" and jax.default_backend() != "cpu":
        from uvc_tpu.ops.performer import fused_performer
        t2 = _unfold_klast(t, 3, 2, 1)                 # (kh, kw, c) order
        fast2 = fused_performer(stem["attention2"], t2, dtype=dtype,
                                feat_idx=_klast_perm(3, td))
    if fast2 is None:
        t = _unfold(t, 3, 2, 1)                        # [B, (g0/2)^2, 9*td]
        t = stage(stem["attention2"], t)
    else:
        t = fast2
    g1 = g0 // 2
    t = t.reshape(b, g1, g1, -1)
    if cfg.tokens_type == "performer" and jax.default_backend() != "cpu":
        # final soft split feeds a plain linear: permute ITS rows instead
        t = _unfold_klast(t, 3, 2, 1)
        kernel = stem["project"]["kernel"][
            jnp.asarray(_klast_perm(3, t.shape[-1] // 9))]
    else:
        t = _unfold(t, 3, 2, 1)                        # [B, (g1/2)^2, 9*td]
        kernel = stem["project"]["kernel"]
    return (t @ kernel.astype(dtype)
            + stem["project"]["bias"].astype(dtype))


def apply(params: dict, x: jax.Array, cfg: ViTConfig, *,
          gating_distrib: Optional[jax.Array] = None,
          attn_distrib=None, mlp_distrib=None, masks=None,
          jumping: bool = False, rng=None, train: bool = False,
          tau: float = -1.0, patch_ratio: float = 0.9,
          patch_gate_mode: int = 0, patch_hard: bool = False,
          patch_physical: bool = False,
          drop_path_rate: float = 0.0,
          dtype=jnp.float32) -> ForwardOutput:
    """T2T-ViT forward (t2t_vit.py:168-208).  The reference T2T forward has
    no token-selection / patch-gating path; arguments are accepted for API
    symmetry and ignored."""
    b = x.shape[0]
    t = t2t_stem(params, x, cfg, dtype)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim)
                           ).astype(dtype)
    t = jnp.concatenate([cls, t], axis=1)
    pos = jnp.asarray(sinusoid_pos_embed(cfg.num_patches + 1,
                                         cfg.embed_dim))
    t = t + pos.astype(dtype)
    dp = drop_path_rate if (train and drop_path_rate > 0) else 0.0
    t = vit.transformer_encode(params, t, cfg, gating_distrib=gating_distrib,
                               attn_distrib=attn_distrib,
                               mlp_distrib=mlp_distrib, masks=masks,
                               jumping=jumping, drop_path_rate=dp,
                               rng=(jax.random.fold_in(rng, 7)
                                    if rng is not None else None),
                               dtype=dtype)
    logits = (t[:, 0].astype(jnp.float32) @ params["head"]["kernel"]
              + params["head"]["bias"])
    # training returns (x, x): t2t_vit.py:205-208
    return ForwardOutput(logits=logits, logits_kd=logits, token_mask=None)


# signature parity with uvc_tpu.models.vit (model-agnostic train steps)
eval_logits = vit.eval_logits
