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


def test_compact_token_ratio_one_is_identity():
    """token_ratio=1.0 must not engage the gather path; logits equal the
    plain compact (and thus the masked dense) model."""
    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    layers, top = compact_model(params, masks, CFG)
    ref = apply_compact(layers, top, x, CFG, dtype=jnp.float32)
    out = apply_compact(layers, top, x, CFG, dtype=jnp.float32,
                        token_ratio=1.0)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=1e-6)


def test_compact_token_selection_matches_dense_mask():
    """The physically-dropped token set equals the deterministic eval
    mask's kept set (ops/gumbel.py topk_token_mask) — selection parity
    between serving and masked-dense eval."""
    from uvc_tpu.ops.gumbel import topk_token_mask

    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (3, CFG.img_size, CFG.img_size, CFG.in_chans))
    ratio = 0.7
    k = int(ratio * CFG.num_patches)

    emb = vit.patch_embed(params, x, CFG, jnp.float32)
    scores = (emb @ params["token_scorer"]["kernel"]
              + params["token_scorer"]["bias"]).squeeze(-1)
    mask = np.asarray(topk_token_mask(scores, k))
    assert (mask.sum(-1) == k).all()
    assert (mask[:, 0] == 1).all()

    boosted = scores.at[:, 0].set(jnp.inf)
    idx = np.sort(np.asarray(jax.lax.top_k(boosted, k)[1]), axis=-1)
    for b in range(mask.shape[0]):
        np.testing.assert_array_equal(np.nonzero(mask[b])[0], idx[b])


def test_compact_token_slimming_runs_and_tracks_dense():
    """Slimmed serving forward: correct static shapes, reduced FLOPs, and
    logits close to the masked dense model (exact up to the dropped
    ghost tokens' position-only contribution — see apply_compact)."""
    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    ratio = 0.7
    g = params["block_gating"]
    keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
    gating = jnp.stack([1.0 - keep, keep], axis=-1)
    # masked dense with the SAME deterministic token mask (rng=None)
    ref = vit.apply(params, x, CFG, gating_distrib=gating, masks=masks,
                    patch_gate_mode=2, patch_ratio=ratio, rng=None,
                    train=False, dtype=jnp.float32)

    layers, top = compact_model(params, masks, CFG)
    out = apply_compact(layers, top, x, CFG, dtype=jnp.float32,
                        token_ratio=ratio)
    ref_l = np.asarray(ref.logits)
    out_l = np.asarray(out.logits)
    rel = np.linalg.norm(out_l - ref_l) / np.linalg.norm(ref_l)
    assert rel < 0.25, f"slimmed logits drifted {rel:.3f} from masked dense"

    frac_full = compact_flops_fraction(layers, CFG)
    frac_slim = compact_flops_fraction(layers, CFG, token_ratio=ratio)
    assert frac_slim < frac_full * 0.85


def test_compact_slim_matches_physical_dense_eval():
    """The compact token-drop serving path is EXACTLY vit.apply's physical
    deterministic drop (patch_physical=True) — the semantics stage 2 now
    trains and validates under (train/step.py).  The ghost-row drift the
    masked path carries (2.35 accuracy points on the hardened r4 e2e task,
    gate A7) is gone by construction: training == serving."""
    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    ratio = 0.7
    g = params["block_gating"]
    keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
    gating = jnp.stack([1.0 - keep, keep], axis=-1)
    ref = vit.apply(params, x, CFG, gating_distrib=gating, masks=masks,
                    patch_gate_mode=2, patch_ratio=ratio, rng=None,
                    patch_physical=True, train=False, dtype=jnp.float32)
    assert ref.token_mask is None                # gathered, not masked

    layers, top = compact_model(params, masks, CFG)
    out = apply_compact(layers, top, x, CFG, dtype=jnp.float32,
                        token_ratio=ratio)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=2e-4, atol=2e-4)


def test_dense_eval_deterministic_token_mask():
    """vit.apply with token selection and rng=None uses the noise-free
    top-k (serving semantics) and returns exactly k kept tokens."""
    params, _ = _setup()
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (2, CFG.img_size, CFG.img_size, CFG.in_chans))
    out = vit.apply(params, x, CFG, patch_gate_mode=2, patch_ratio=0.5,
                    rng=None, train=False, dtype=jnp.float32)
    k = int(0.5 * CFG.num_patches)
    m = np.asarray(out.token_mask)
    assert (m.sum(-1) == k).all()
    assert (m[:, 0] == 1).all()
