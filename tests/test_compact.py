"""Physical compaction (uvc_tpu/infer/compact.py): the sliced model must
reproduce the masked dense model's logits while computing fewer FLOPs."""

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.compress.masks import build_masks
from uvc_tpu.configs import get_config
from uvc_tpu.infer.compact import (apply_compact, compact_flops_fraction,
                                   compact_model)
from uvc_tpu.models import vit

CFG = get_config("testing").replace(embed_dim=16, num_heads=2, depth=3,
                                    num_classes=7)


def _setup():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    params["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(5), params["head"]["kernel"].shape) * 0.1
    # nontrivial architecture: prune 1 head in layer 0, 2 of 8 head-dims in
    # layer 1, half the mlp units everywhere; skip block 2 via gating
    s = jnp.array([[1.0, 32.0], [0.0, 32.0], [0.0, 32.0]])
    r = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 0.0]])
    masks = build_masks(params, s, r, CFG)
    params["block_gating"] = jnp.array(
        [[-1.0, 1.0], [-1.0, 1.0], [1.0, -1.0]])
    return params, masks


def test_compact_matches_masked_dense():
    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    g = params["block_gating"]
    keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
    gating = jnp.stack([1.0 - keep, keep], axis=-1)
    ref = vit.apply(params, x, CFG, gating_distrib=gating, masks=masks,
                    train=False, dtype=jnp.float32)

    layers, top = compact_model(params, masks, CFG)
    assert len(layers) == 2                      # block 2 dropped
    out = apply_compact(layers, top, x, CFG, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=2e-4, atol=2e-4)


def test_compact_head_slicing():
    params, masks = _setup()
    layers, _ = compact_model(params, masks, CFG)
    # layer 0 pruned one of two heads: qkv out = 3 * 1 * head_size
    hs = CFG.head_size
    assert layers[0]["num_heads"] == 1
    assert layers[0]["qkv"]["kernel"].shape == (16, 3 * hs)
    assert layers[0]["proj"]["kernel"].shape == (hs, 16)
    # layer 1 kept both heads (only within-head dims pruned)
    assert layers[1]["num_heads"] == 2


def test_compact_flops_fraction_below_one():
    params, masks = _setup()
    layers, _ = compact_model(params, masks, CFG)
    frac = compact_flops_fraction(layers, CFG)
    assert 0.0 < frac < 0.85


def test_compact_t2t_matches_masked_dense():
    """Serving compaction extends to the T2T family: dense tokens-to-token
    stem + compacted backbone must reproduce the masked dense T2T model."""
    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.models import t2t_vit

    cfg = get_config("t2t_vit_7").replace(
        img_size=64, num_classes=7, depth=3, num_heads=2, embed_dim=16,
        mlp_ratio=2.0)
    params = t2t_vit.init_params(jax.random.PRNGKey(0), cfg)
    params["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(5), params["head"]["kernel"].shape) * 0.1
    s = jnp.array([[1.0, 8.0], [0.0, 8.0], [0.0, 8.0]])
    r = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 0.0]])
    masks = build_masks(params, s, r, cfg)
    params["block_gating"] = jnp.array(
        [[-1.0, 1.0], [-1.0, 1.0], [1.0, -1.0]])

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.img_size, cfg.img_size, 3))
    g = params["block_gating"]
    keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
    gating = jnp.stack([1.0 - keep, keep], axis=-1)
    ref = t2t_vit.apply(params, x, cfg, gating_distrib=gating, masks=masks,
                        train=False, dtype=jnp.float32)

    layers, top = compact_model(params, masks, cfg)
    assert len(layers) == 2
    assert "t2t" in top
    out = apply_compact(layers, top, x, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=2e-4, atol=2e-4)
