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
    params["pos_embed"] = _np(sd["pos_embed"])
    if params["pos_embed"].shape[1] != cfg.seq_len:
        raise ValueError(
            f"pos_embed length {params['pos_embed'].shape[1]} != "
            f"config seq_len {cfg.seq_len} (distilled mismatch?)")

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
    params["head"] = lin("head.weight", "head.bias")
    if cfg.distilled:
        params["dist_token"] = _np(sd["dist_token"])
        params["head_dist"] = lin("head_dist.weight", "head_dist.bias")

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
    return from_torch_state_dict(ckpt, cfg)
