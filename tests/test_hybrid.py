"""R50+ViT hybrid stem and the .npz checkpoint loader
(reference: models/modeling_resnet.py, modeling.py load_from :328-381)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uvc_tpu.configs import get_config
from uvc_tpu.models import vit
from uvc_tpu.models.resnet import apply_resnet_stem, init_resnet_stem


def test_resnet_stem_shapes():
    # tiny stem: blocks (1, 1, 1), width 1 => stride 16, channels 1024
    key = jax.random.PRNGKey(0)
    p = init_resnet_stem(key, (1, 1, 1), 1)
    x = jax.random.normal(key, (2, 64, 64, 3))
    y = apply_resnet_stem(p, x, (1, 1, 1))
    assert y.shape == (2, 4, 4, 1024)
    assert bool(jnp.all(jnp.isfinite(y)))
    # relu output
    assert float(jnp.min(y)) >= 0.0


def test_hybrid_vit_forward():
    cfg = get_config("R50-ViT-B_16").replace(
        img_size=64, depth=2, num_classes=7, embed_dim=64, num_heads=2,
        resnet_layers=(1, 1, 1))
    assert cfg.grid_size == 4 and cfg.seq_len == 17
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    assert "resnet" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = vit.apply(params, x, cfg, train=False)
    assert out.logits.shape == (2, 7)
    assert bool(jnp.all(jnp.isfinite(out.logits)))


def _fake_npz(tmp_path, cfg, grid_old=4):
    """Synthesize an upstream-format .npz for a tiny pure-ViT config."""
    d, l, f = cfg.embed_dim, cfg.depth, cfg.mlp_hidden
    h, dh = cfg.num_heads, cfg.head_size
    rng = np.random.default_rng(0)
    w = {}
    p = cfg.patch_size
    w["embedding/kernel"] = rng.normal(size=(p, p, 3, d)).astype(np.float32)
    w["embedding/bias"] = np.zeros(d, np.float32)
    w["cls"] = rng.normal(size=(1, 1, d)).astype(np.float32)
    w["Transformer/posembed_input/pos_embedding"] = rng.normal(
        size=(1, grid_old * grid_old + 1, d)).astype(np.float32)
    w["Transformer/encoder_norm/scale"] = np.ones(d, np.float32)
    w["Transformer/encoder_norm/bias"] = np.zeros(d, np.float32)
    w["head/kernel"] = rng.normal(
        size=(d, cfg.num_classes)).astype(np.float32)
    w["head/bias"] = np.zeros(cfg.num_classes, np.float32)
    at = "MultiHeadDotProductAttention_1"
    for i in range(l):
        pre = f"Transformer/encoderblock_{i}"
        for nm in ("query", "key", "value"):
            w[f"{pre}/{at}/{nm}/kernel"] = rng.normal(
                size=(d, h, dh)).astype(np.float32)
            w[f"{pre}/{at}/{nm}/bias"] = np.zeros((h, dh), np.float32)
        w[f"{pre}/{at}/out/kernel"] = rng.normal(
            size=(h, dh, d)).astype(np.float32)
        w[f"{pre}/{at}/out/bias"] = np.zeros(d, np.float32)
        w[f"{pre}/MlpBlock_3/Dense_0/kernel"] = rng.normal(
            size=(d, f)).astype(np.float32)
        w[f"{pre}/MlpBlock_3/Dense_0/bias"] = np.zeros(f, np.float32)
        w[f"{pre}/MlpBlock_3/Dense_1/kernel"] = rng.normal(
            size=(f, d)).astype(np.float32)
        w[f"{pre}/MlpBlock_3/Dense_1/bias"] = np.zeros(d, np.float32)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            w[f"{pre}/{ln}/scale"] = np.ones(d, np.float32)
            w[f"{pre}/{ln}/bias"] = np.zeros(d, np.float32)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **w)
    return path


def test_npz_loader_and_pos_resize(tmp_path):
    from uvc_tpu.models.convert import load_npz_checkpoint
    cfg = get_config("ViT-B_16").replace(
        img_size=32, patch_size=16, depth=2, embed_dim=16, num_heads=2,
        num_classes=5)
    # checkpoint carries a 4x4 grid; config wants 2x2 -> resize path
    path = _fake_npz(tmp_path, cfg, grid_old=4)
    params = load_npz_checkpoint(path, cfg)
    assert params["pos_embed"].shape == (1, cfg.seq_len, cfg.embed_dim)
    assert params["blocks"]["qkv"]["kernel"].shape == (2, 16, 48)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    out = vit.apply(params, x, cfg, train=False)
    assert out.logits.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out.logits)))

    # fine-tune to a different label set: zero_head (modeling.py:330-332)
    cfg7 = cfg.replace(num_classes=7)
    p7 = load_npz_checkpoint(path, cfg7)
    assert p7["head"]["kernel"].shape == (16, 7)
    assert not np.any(p7["head"]["kernel"])


def test_t2t_torch_checkpoint_conversion():
    """Synthetic T2T-ViT torch state dict (T2TViT naming) -> params
    pytree -> finite forward."""
    from uvc_tpu.models import t2t_vit
    from uvc_tpu.models.convert import from_t2t_state_dict

    cfg = get_config("t2t_vit_7").replace(
        img_size=64, embed_dim=32, depth=2, num_heads=2, token_dim=16,
        num_classes=5)
    rng = np.random.default_rng(0)
    d, td, f = 32, 16, int(32 * cfg.mlp_ratio)
    sd = {}

    def lin(name, fi, fo, bias=True):
        sd[name + ".weight"] = rng.normal(size=(fo, fi)).astype(np.float32)
        if bias:
            sd[name + ".bias"] = np.zeros(fo, np.float32)

    def ln(name, n):
        sd[name + ".weight"] = np.ones(n, np.float32)
        sd[name + ".bias"] = np.zeros(n, np.float32)

    for stage, dim in (("attention1", 3 * 7 * 7), ("attention2", td * 9)):
        pre = f"tokens_to_token.{stage}"
        lin(pre + ".kqv", dim, 3 * td)
        lin(pre + ".proj", td, td)
        ln(pre + ".norm1", dim)
        ln(pre + ".norm2", td)
        lin(pre + ".mlp.0", td, td)
        lin(pre + ".mlp.2", td, td)
        sd[pre + ".w"] = rng.normal(size=(td // 2, td)).astype(np.float32)
    lin("tokens_to_token.project", td * 9, d)
    sd["cls_token"] = rng.normal(size=(1, 1, d)).astype(np.float32)
    for i in range(2):
        ln(f"blocks.{i}.norm1", d)
        lin(f"blocks.{i}.attn.qkv", d, 3 * d, bias=False)
        lin(f"blocks.{i}.attn.proj", d, d)
        ln(f"blocks.{i}.norm2", d)
        lin(f"blocks.{i}.mlp.fc1", d, f)
        lin(f"blocks.{i}.mlp.fc2", f, d)
    ln("norm", d)
    lin("head", d, 5)

    # transfer learning: deleted/mismatched head -> fresh trunc-normal init
    # (T2TViT/utils.py:68-72)
    sd_nohead = {k: v for k, v in sd.items() if not k.startswith("head.")}
    p2 = from_t2t_state_dict(sd_nohead, cfg)
    assert p2["head"]["kernel"].shape == (d, 5)
    assert np.any(p2["head"]["kernel"] != 0)

    params = from_t2t_state_dict(sd, cfg)
    assert params["t2t"]["attention1"]["prm_w"].shape == (td // 2, td)
    assert params["blocks"]["qkv"]["kernel"].shape == (2, d, 3 * d)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    out = t2t_vit.apply(params, x, cfg, train=False)
    assert out.logits.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out.logits)))
