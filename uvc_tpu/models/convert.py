"""Convert DeiT / T2T-ViT PyTorch checkpoints to uvc_tpu parameter pytrees.

Handles the timm/DeiT naming used by the reference checkpoints
(joint_train.py:152-166 loads ``checkpoint['model']`` or
``checkpoint['state_dict_ema']``):

  patch_embed.proj.weight [D, C, P, P] -> patch_embed.kernel [P, P, C, D]
  blocks.N.attn.qkv.weight [3D, D]     -> blocks.qkv.kernel [L, D, 3D]
  blocks.N.attn.proj.weight [D, D]     -> blocks.proj.kernel [L, D, D]
  blocks.N.mlp.fc{1,2}.weight          -> blocks.fc{1,2}.kernel
  (all torch Linear weights are [out, in] and transpose to [in, out])

Stacks per-block tensors along a leading layer axis (lax.scan layout) and
fills UVC-specific leaves (block_gating init [-1, 1], token_scorer) when the
checkpoint predates them.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from uvc_tpu.configs import ViTConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _fresh_head(d: int, num_classes: int, seed: int = 0) -> dict:
    """Freshly initialized classifier head for transfer learning.

    The reference deletes the checkpoint's head when ``num_classes`` differs
    and keeps the model's own trunc_normal(std=.02) init
    (T2TViT/utils.py:68-72 + load_for_transfer_learning :88-89)."""
    rng = np.random.default_rng(seed)
    # resample out-of-range draws (timm trunc_normal_ semantics) instead
    # of clipping, which would put point masses at +-2 sigma
    k = rng.standard_normal((d, num_classes))
    bad = np.abs(k) > 2.0
    while bad.any():
        k[bad] = rng.standard_normal(int(bad.sum()))
        bad = np.abs(k) > 2.0
    k = (k * 0.02).astype(np.float32)
    return {"kernel": k, "bias": np.zeros(num_classes, np.float32)}


def resize_pos_embed(pos: np.ndarray, new_len: int, new_prefix: int = 1,
                     old_prefix: int = 1) -> np.ndarray:
    """Bicubic grid resize of a learned position embedding.

    Mirrors the reference's transfer-learning resize (T2TViT/utils.py:27-43,
    itself adapted from the vision_transformer checkpoint tools): the
    leading class(/dist) token rows are carried over unscaled and the
    patch-grid rows are interpolated as a 2-D image.  When the target has
    more prefix rows than the source (plain -> distilled), the extra rows
    repeat the class-token row."""
    tok, grid = pos[:, :old_prefix], pos[0, old_prefix:]
    gs_old = int(np.sqrt(grid.shape[0]))
    gs_new = int(np.sqrt(new_len - new_prefix))
    if gs_old * gs_old != grid.shape[0] or gs_new * gs_new != \
            new_len - new_prefix:
        raise ValueError(
            f"pos_embed grid not square: {grid.shape[0]} -> "
            f"{new_len - new_prefix} tokens")
    import jax
    import jax.numpy as jnp
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = np.asarray(jax.image.resize(
        jnp.asarray(grid), (gs_new, gs_new, grid.shape[-1]),
        method="cubic"), np.float32)
    if new_prefix <= old_prefix:
        tok = tok[:, :new_prefix]
    else:
        tok = np.concatenate(
            [tok] + [tok[:, :1]] * (new_prefix - old_prefix), axis=1)
    return np.concatenate([tok, grid.reshape(1, gs_new * gs_new, -1)],
                          axis=1)


def from_torch_state_dict(sd: Mapping[str, "np.ndarray"], cfg: ViTConfig
                          ) -> dict:
    """Build a uvc_tpu params pytree from a torch state_dict-like mapping."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    l, d = cfg.depth, cfg.embed_dim
    p = cfg.patch_size

    def lin(name_w, name_b, fallback_shape=None):
        if name_w in sd:
            k = _np(sd[name_w]).T  # [out,in] -> [in,out]
            b = _np(sd[name_b]) if name_b in sd else \
                np.zeros(k.shape[1], np.float32)
            return {"kernel": k, "bias": b}
        if fallback_shape is None:
            raise KeyError(name_w)
        return {"kernel": np.zeros(fallback_shape, np.float32),
                "bias": np.zeros(fallback_shape[-1], np.float32)}

    def stack_lin(fmt: str):
        ks, bs = [], []
        for i in range(l):
            layer = lin(fmt.format(i) + ".weight", fmt.format(i) + ".bias")
            ks.append(layer["kernel"])
            bs.append(layer["bias"])
        return {"kernel": np.stack(ks), "bias": np.stack(bs)}

    def stack_ln(fmt: str):
        return {
            "scale": np.stack([_np(sd[fmt.format(i) + ".weight"])
                               for i in range(l)]),
            "bias": np.stack([_np(sd[fmt.format(i) + ".bias"])
                              for i in range(l)]),
        }

    params: dict = {}
    pe = _np(sd["patch_embed.proj.weight"])       # [D, C, P, P]
    params["patch_embed"] = {
        "kernel": pe.transpose(2, 3, 1, 0),       # [P, P, C, D]
        "bias": _np(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = _np(sd["cls_token"])
    pos = _np(sd["pos_embed"])
    if pos.shape[1] != cfg.seq_len:
        # transfer learning at a different image size: bicubic grid resize
        # (T2TViT/utils.py:77-80; same mechanism as timm's DeiT loaders)
        pos = resize_pos_embed(pos, cfg.seq_len,
                               new_prefix=2 if cfg.distilled else 1,
                               old_prefix=2 if "dist_token" in sd else 1)
    params["pos_embed"] = pos

    params["blocks"] = {
        "ln1": stack_ln("blocks.{}.norm1"),
        "qkv": stack_lin("blocks.{}.attn.qkv"),
        "proj": stack_lin("blocks.{}.attn.proj"),
        "ln2": stack_ln("blocks.{}.norm2"),
        "fc1": stack_lin("blocks.{}.mlp.fc1"),
        "fc2": stack_lin("blocks.{}.mlp.fc2"),
    }
    params["norm"] = {"scale": _np(sd["norm.weight"]),
                      "bias": _np(sd["norm.bias"])}
    # transfer learning: discard the checkpoint head on class-count mismatch
    # (or absence — reference transfer checkpoints delete the head keys,
    # T2TViT/utils.py:68-72) and start from a fresh init
    if "head.weight" in sd and \
            _np(sd["head.weight"]).shape[0] == cfg.num_classes:
        params["head"] = lin("head.weight", "head.bias")
    else:
        params["head"] = _fresh_head(d, cfg.num_classes)
    if cfg.distilled:
        params["dist_token"] = _np(sd["dist_token"])
        if "head_dist.weight" in sd and \
                _np(sd["head_dist.weight"]).shape[0] == cfg.num_classes:
            params["head_dist"] = lin("head_dist.weight", "head_dist.bias")
        else:
            params["head_dist"] = _fresh_head(d, cfg.num_classes, seed=1)

    # UVC-specific leaves (present in stage-1 checkpoints, synthesized for
    # plain pretrained DeiT checkpoints)
    if "block_skip_gating" in sd:
        params["block_gating"] = _np(sd["block_skip_gating"])
    else:
        params["block_gating"] = np.tile(
            np.array([-1.0, 1.0], np.float32), (l, 1))
    params["attn_gating"] = np.tile(np.array([-1.0, 1.0], np.float32),
                                    (l, 1))
    params["mlp_gating"] = np.tile(np.array([-1.0, 1.0], np.float32), (l, 1))
    params["token_scorer"] = lin("gumbel.weight", "gumbel.bias",
                                 fallback_shape=(d, 1))
    if "patch_gating" in sd:
        params["patch_gating"] = _np(sd["patch_gating"])
    return params


def to_torch_state_dict(params: dict, cfg: ViTConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion for interoperability / export."""
    sd: Dict[str, np.ndarray] = {}
    pe = np.asarray(params["patch_embed"]["kernel"])
    sd["patch_embed.proj.weight"] = pe.transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    sd["cls_token"] = np.asarray(params["cls_token"])
    sd["pos_embed"] = np.asarray(params["pos_embed"])
    blocks = params["blocks"]
    l = cfg.depth
    for i in range(l):
        sd[f"blocks.{i}.norm1.weight"] = np.asarray(blocks["ln1"]["scale"][i])
        sd[f"blocks.{i}.norm1.bias"] = np.asarray(blocks["ln1"]["bias"][i])
        sd[f"blocks.{i}.norm2.weight"] = np.asarray(blocks["ln2"]["scale"][i])
        sd[f"blocks.{i}.norm2.bias"] = np.asarray(blocks["ln2"]["bias"][i])
        for src, dst in (("qkv", "attn.qkv"), ("proj", "attn.proj"),
                         ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            sd[f"blocks.{i}.{dst}.weight"] = \
                np.asarray(blocks[src]["kernel"][i]).T
            sd[f"blocks.{i}.{dst}.bias"] = np.asarray(blocks[src]["bias"][i])
    sd["norm.weight"] = np.asarray(params["norm"]["scale"])
    sd["norm.bias"] = np.asarray(params["norm"]["bias"])
    sd["head.weight"] = np.asarray(params["head"]["kernel"]).T
    sd["head.bias"] = np.asarray(params["head"]["bias"])
    if cfg.distilled:
        sd["dist_token"] = np.asarray(params["dist_token"])
        sd["head_dist.weight"] = np.asarray(params["head_dist"]["kernel"]).T
        sd["head_dist.bias"] = np.asarray(params["head_dist"]["bias"])
    sd["block_skip_gating"] = np.asarray(params["block_gating"])
    sd["gumbel.weight"] = np.asarray(params["token_scorer"]["kernel"]).T
    sd["gumbel.bias"] = np.asarray(params["token_scorer"]["bias"])
    return sd


def load_torch_checkpoint(path: str, cfg: ViTConfig) -> dict:
    """Load a .pth/.pth.tar checkpoint via torch (CPU) and convert.

    Tries ``['model']`` then ``['state_dict_ema']`` like the reference
    (joint_train.py:162-166)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict_ema", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    if any(k.startswith(("tokens_to_token.", "module.tokens_to_token."))
           for k in ckpt):
        return from_t2t_state_dict(ckpt, cfg)
    return from_torch_state_dict(ckpt, cfg)


def load_npz_checkpoint(path: str, cfg: ViTConfig) -> dict:
    """Load upstream jax-format ViT .npz weights (the jeonsworld
    ``load_from`` path: models/modeling.py:328-381, including bilinear
    pos-embed grid resize and the R50 hybrid stem keys
    modeling_resnet.py:94-126).

    The .npz is already in jax layout (kernels [in, out], conv HWIO,
    attention q/k/v kernels [D, H, dh]) so tensors load verbatim; q/k/v
    are fused into the qkv layout and blocks are stacked on a layer axis.
    """
    import jax
    import jax.numpy as jnp

    w = dict(np.load(path, allow_pickle=False))
    d, l = cfg.embed_dim, cfg.depth

    def arr(k):
        return np.asarray(w[k], np.float32)

    def block(i, name):
        return arr(f"Transformer/encoderblock_{i}/{name}")

    qkvs, qkvb, projs, projb = [], [], [], []
    fc1s, fc1b, fc2s, fc2b = [], [], [], []
    ln1s, ln1b, ln2s, ln2b = [], [], [], []
    at = "MultiHeadDotProductAttention_1"
    for i in range(l):
        q = block(i, f"{at}/query/kernel").reshape(d, d)
        k = block(i, f"{at}/key/kernel").reshape(d, d)
        v = block(i, f"{at}/value/kernel").reshape(d, d)
        qkvs.append(np.concatenate([q, k, v], axis=1))       # [D, 3D]
        qb = block(i, f"{at}/query/bias").reshape(-1)
        kb = block(i, f"{at}/key/bias").reshape(-1)
        vb = block(i, f"{at}/value/bias").reshape(-1)
        qkvb.append(np.concatenate([qb, kb, vb]))
        projs.append(block(i, f"{at}/out/kernel").reshape(d, d))
        projb.append(block(i, f"{at}/out/bias").reshape(-1))
        fc1s.append(block(i, "MlpBlock_3/Dense_0/kernel"))
        fc1b.append(block(i, "MlpBlock_3/Dense_0/bias"))
        fc2s.append(block(i, "MlpBlock_3/Dense_1/kernel"))
        fc2b.append(block(i, "MlpBlock_3/Dense_1/bias"))
        ln1s.append(block(i, "LayerNorm_0/scale"))
        ln1b.append(block(i, "LayerNorm_0/bias"))
        ln2s.append(block(i, "LayerNorm_2/scale"))
        ln2b.append(block(i, "LayerNorm_2/bias"))

    pos = arr("Transformer/posembed_input/pos_embedding")    # [1, N+1, D]
    if pos.shape[1] != cfg.seq_len:
        # bilinear grid resize (modeling.py:345-369)
        tok, grid = pos[:, :1], pos[0, 1:]
        gs_old = int(np.sqrt(grid.shape[0]))
        gs_new = cfg.grid_size
        grid = grid.reshape(gs_old, gs_old, -1)
        grid = np.asarray(jax.image.resize(
            jnp.asarray(grid), (gs_new, gs_new, grid.shape[-1]),
            method="bilinear"))
        pos = np.concatenate([tok, grid.reshape(1, gs_new * gs_new, -1)],
                             axis=1)

    params: dict = {
        "patch_embed": {"kernel": arr("embedding/kernel"),
                        "bias": arr("embedding/bias")},
        "cls_token": arr("cls").reshape(1, 1, d),
        "pos_embed": pos,
        "blocks": {
            "ln1": {"scale": np.stack(ln1s), "bias": np.stack(ln1b)},
            "qkv": {"kernel": np.stack(qkvs), "bias": np.stack(qkvb)},
            "proj": {"kernel": np.stack(projs), "bias": np.stack(projb)},
            "ln2": {"scale": np.stack(ln2s), "bias": np.stack(ln2b)},
            "fc1": {"kernel": np.stack(fc1s), "bias": np.stack(fc1b)},
            "fc2": {"kernel": np.stack(fc2s), "bias": np.stack(fc2b)},
        },
        "norm": {"scale": arr("Transformer/encoder_norm/scale"),
                 "bias": arr("Transformer/encoder_norm/bias")},
        # fine-tuning to a different label set zero-inits the head, the
        # reference's zero_head semantics (modeling.py:330-332)
        "head": {"kernel": arr("head/kernel").reshape(d, -1),
                 "bias": arr("head/bias").reshape(-1)}
        if arr("head/bias").size == cfg.num_classes
        else {"kernel": np.zeros((d, cfg.num_classes), np.float32),
              "bias": np.zeros(cfg.num_classes, np.float32)},
        "block_gating": np.tile(np.array([-1.0, 1.0], np.float32), (l, 1)),
        "attn_gating": np.tile(np.array([-1.0, 1.0], np.float32), (l, 1)),
        "mlp_gating": np.tile(np.array([-1.0, 1.0], np.float32), (l, 1)),
        "token_scorer": {"kernel": np.zeros((d, 1), np.float32),
                         "bias": np.zeros((1,), np.float32)},
    }

    if cfg.hybrid:
        stem: dict = {"conv_root": arr("conv_root/kernel"),
                      "gn_root": {"scale": arr("gn_root/scale").reshape(-1),
                                  "bias": arr("gn_root/bias").reshape(-1)}}
        for bi, n_units in enumerate(cfg.resnet_layers):
            units = []
            for u in range(n_units):
                pre = f"block{bi + 1}/unit{u + 1}"
                unit = {
                    "conv1": arr(f"{pre}/conv1/kernel"),
                    "gn1": {"scale": arr(f"{pre}/gn1/scale").reshape(-1),
                            "bias": arr(f"{pre}/gn1/bias").reshape(-1)},
                    "conv2": arr(f"{pre}/conv2/kernel"),
                    "gn2": {"scale": arr(f"{pre}/gn2/scale").reshape(-1),
                            "bias": arr(f"{pre}/gn2/bias").reshape(-1)},
                    "conv3": arr(f"{pre}/conv3/kernel"),
                    "gn3": {"scale": arr(f"{pre}/gn3/scale").reshape(-1),
                            "bias": arr(f"{pre}/gn3/bias").reshape(-1)},
                }
                if f"{pre}/conv_proj/kernel" in w:
                    unit["conv_proj"] = arr(f"{pre}/conv_proj/kernel")
                    unit["gn_proj"] = {
                        "scale": arr(f"{pre}/gn_proj/scale").reshape(-1),
                        "bias": arr(f"{pre}/gn_proj/bias").reshape(-1)}
                units.append(unit)
            stem[f"block{bi + 1}"] = units
        params["resnet"] = stem
    return params


def _t2t_stage(sd: Mapping, prefix: str, performer: bool) -> dict:
    """One tokens-to-token attention stage (T2TViT/models/
    token_performer.py:8-29 / token_transformer.py:13-27)."""

    def lin(name):
        w = _np(sd[f"{prefix}.{name}.weight"]).T
        bkey = f"{prefix}.{name}.bias"
        b = _np(sd[bkey]) if bkey in sd else np.zeros(w.shape[1], np.float32)
        return {"kernel": w, "bias": b}

    def ln(name):
        return {"scale": _np(sd[f"{prefix}.{name}.weight"]),
                "bias": _np(sd[f"{prefix}.{name}.bias"])}

    if performer:
        return {"kqv": lin("kqv"), "proj": lin("proj"),
                "norm1": ln("norm1"), "norm2": ln("norm2"),
                "mlp_fc1": lin("mlp.0"), "mlp_fc2": lin("mlp.2"),
                "prm_w": _np(sd[f"{prefix}.w"])}
    return {"qkv": lin("attn.qkv"), "proj": lin("attn.proj"),
            "norm1": ln("norm1"), "norm2": ln("norm2"),
            "mlp_fc1": lin("mlp.fc1"), "mlp_fc2": lin("mlp.fc2")}


def from_t2t_state_dict(sd: Mapping, cfg: ViTConfig) -> dict:
    """Convert an upstream T2T-ViT checkpoint (T2TViT/models/t2t_vit.py
    naming: tokens_to_token.attention{1,2}, blocks.N.* identical to DeiT,
    fixed sinusoid pos_embed excluded)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    performer = cfg.tokens_type == "performer"
    l = cfg.depth

    def stack_lin(fmt):
        ks, bs = [], []
        for i in range(l):
            w = _np(sd[fmt.format(i) + ".weight"]).T
            bkey = fmt.format(i) + ".bias"
            b = _np(sd[bkey]) if bkey in sd \
                else np.zeros(w.shape[1], np.float32)
            ks.append(w)
            bs.append(b)
        return {"kernel": np.stack(ks), "bias": np.stack(bs)}

    def stack_ln(fmt):
        return {"scale": np.stack([_np(sd[fmt.format(i) + ".weight"])
                                   for i in range(l)]),
                "bias": np.stack([_np(sd[fmt.format(i) + ".bias"])
                                  for i in range(l)])}

    params = {
        "cls_token": _np(sd["cls_token"]),
        "blocks": {
            "ln1": stack_ln("blocks.{}.norm1"),
            "qkv": stack_lin("blocks.{}.attn.qkv"),
            "proj": stack_lin("blocks.{}.attn.proj"),
            "ln2": stack_ln("blocks.{}.norm2"),
            "fc1": stack_lin("blocks.{}.mlp.fc1"),
            "fc2": stack_lin("blocks.{}.mlp.fc2"),
        },
        "norm": {"scale": _np(sd["norm.weight"]),
                 "bias": _np(sd["norm.bias"])},
        # transfer learning: fresh head when the checkpoint's class count
        # differs or its head was deleted (T2TViT/utils.py:68-72)
        "head": {"kernel": _np(sd["head.weight"]).T,
                 "bias": _np(sd["head.bias"])}
        if "head.weight" in sd and
        _np(sd["head.weight"]).shape[0] == cfg.num_classes
        else _fresh_head(cfg.embed_dim, cfg.num_classes),
        "t2t": {
            "attention1": _t2t_stage(sd, "tokens_to_token.attention1",
                                     performer),
            "attention2": _t2t_stage(sd, "tokens_to_token.attention2",
                                     performer),
            "project": {
                "kernel": _np(sd["tokens_to_token.project.weight"]).T,
                "bias": _np(sd["tokens_to_token.project.bias"]),
            },
        },
        "block_gating": _np(sd["block_skip_gating"])
        if "block_skip_gating" in sd
        else np.tile(np.array([-1.0, 1.0], np.float32), (l, 1)),
        "attn_gating": np.tile(np.array([-1.0, 1.0], np.float32), (l, 1)),
        "mlp_gating": np.tile(np.array([-1.0, 1.0], np.float32), (l, 1)),
    }
    return params
