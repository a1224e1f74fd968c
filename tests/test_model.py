"""Model forward tests: shapes, gating, masks, token selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvc_tpu.configs import get_config
from uvc_tpu.models import vit

CFG = get_config("testing")  # D=8, L=1, H=1, img 32 -> 4 patches + cls


@pytest.fixture(scope="module")
def params():
    p = vit.init_params(jax.random.PRNGKey(0), CFG)
    # the classifier head is zero-init (reference parity); give it weight so
    # logits actually depend on features in these tests
    p["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(42), p["head"]["kernel"].shape) * 0.1
    return p


def _x(b=2):
    return jax.random.normal(jax.random.PRNGKey(1),
                             (b, CFG.img_size, CFG.img_size, CFG.in_chans))


def test_forward_shapes(params):
    out = vit.apply(params, _x(), CFG, train=True)
    assert out.logits.shape == (2, CFG.num_classes)
    assert out.logits_kd.shape == (2, CFG.num_classes)
    # no dist head: kd logits alias the cls logits
    np.testing.assert_allclose(out.logits, out.logits_kd)


def test_distilled_heads_differ():
    cfg = CFG.replace(distilled=True)
    p = vit.init_params(jax.random.PRNGKey(0), cfg)
    # zero-init heads produce equal (zero) logits; perturb one head
    p["head_dist"]["bias"] = p["head_dist"]["bias"] + 1.0
    out = vit.apply(p, _x(), cfg, train=True)
    assert np.abs(np.asarray(out.logits - out.logits_kd)).max() > 0.5
    ev = vit.eval_logits(out, cfg)
    np.testing.assert_allclose(ev, (out.logits + out.logits_kd) / 2)


def test_block_gating_skip_is_identity(params):
    """distrib=(1,0) must make every block an identity."""
    x = _x()
    skip = jnp.tile(jnp.array([[1.0, 0.0]]), (CFG.depth, 1))
    out = vit.apply(params, x, CFG, gating_distrib=skip, train=True)
    # with all blocks skipped, features = LN(embed + pos); compare against
    # a depth-0 manual computation
    emb = vit.patch_embed(params, x, CFG)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(params["cls_token"], (2, 1, CFG.embed_dim)), emb],
        axis=1) + params["pos_embed"]
    ln = vit._layer_norm(tokens, params["norm"]["scale"],
                         params["norm"]["bias"], CFG.layer_norm_eps)
    expect = ln[:, 0] @ params["head"]["kernel"] + params["head"]["bias"]
    np.testing.assert_allclose(out.logits, expect, atol=1e-5)


def test_gating_keep_equals_ungated(params):
    x = _x()
    keep = jnp.tile(jnp.array([[0.0, 1.0]]), (CFG.depth, 1))
    out_gated = vit.apply(params, x, CFG, gating_distrib=keep, train=True)
    out_plain = vit.apply(params, x, CFG, train=True)
    np.testing.assert_allclose(out_gated.logits, out_plain.logits, atol=1e-5)


def test_masks_equal_weight_pruning(params):
    """Activation masking must equal hard-zeroing the weight groups."""
    from uvc_tpu.compress.masks import build_masks, prune_weights
    x = _x()
    s = jnp.array([[0.0, 10.0]])   # remove 10 MLP units (of 32)
    r = jnp.array([[3.0]])         # remove 3 dims of the single head
    masks = build_masks(params, s, r, CFG)
    out_masked = vit.apply(params, x, CFG, masks=masks, train=True)
    pruned = prune_weights(params, masks, CFG)
    out_pruned = vit.apply(pruned, x, CFG, train=True)
    np.testing.assert_allclose(out_masked.logits, out_pruned.logits,
                               atol=1e-5)


def test_token_selection_zeroes_tokens(params):
    x = _x()
    out = vit.apply(params, x, CFG, tau=1.0, patch_ratio=0.5,
                    rng=jax.random.PRNGKey(5), train=True)
    assert out.token_mask is not None
    counts = np.asarray(out.token_mask).round().sum(-1)
    k = int(0.5 * CFG.num_patches)
    assert ((counts == k) | (counts == k + 1)).all()


def test_patch_gate_mode1(params):
    p = dict(params)
    p["patch_gating"] = jnp.full((1, CFG.num_patches, 1), -100.0)
    x = _x()
    out_soft = vit.apply(p, x, CFG, patch_gate_mode=1, train=True)
    # sigmoid(-100) ~ 0 -> all patches off; equivalent to zeroed embeddings
    p2 = dict(params)
    p2["patch_gating"] = jnp.full((1, CFG.num_patches, 1), 100.0)
    out_on = vit.apply(p2, x, CFG, patch_gate_mode=1, train=True)
    out_plain = vit.apply(params, x, CFG, train=True)
    np.testing.assert_allclose(out_on.logits, out_plain.logits, atol=1e-4)
    assert np.abs(np.asarray(out_soft.logits - out_plain.logits)).max() > 1e-6


def test_bf16_close_to_f32(params):
    x = _x()
    out32 = vit.apply(params, x, CFG, train=True)
    out16 = vit.apply(params, x, CFG, train=True, dtype=jnp.bfloat16)
    assert np.abs(np.asarray(out32.logits - out16.logits)).max() < 0.15


def test_jumping(params):
    x = _x()
    out = vit.apply(params, x, CFG, jumping=True, train=True)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_cait_forward_and_grad():
    """CaiT baseline backbone (Baseline_pruning/cait_models.py): talking-
    heads self-attention stack + class-attention blocks, LayerScale."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import cait, get_model
    cfg = get_config("cait_S24_224").replace(
        img_size=32, embed_dim=16, depth=2, num_heads=2, num_classes=5)
    assert get_model(cfg) is cait
    params = cait.init_params(jax.random.PRNGKey(0), cfg)
    assert params["blocks"]["proj_l"]["kernel"].shape == (2, 2, 2)
    assert params["blocks_ca"]["q"]["kernel"].shape == (2, 16, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = cait.apply(params, x, cfg, train=True)
    assert out.logits.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out.logits)))

    params["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2), params["head"]["kernel"].shape) * 0.1

    def loss(p):
        return jnp.sum(cait.apply(p, x, cfg, train=True).logits ** 2)

    g = jax.grad(loss)(params)
    gp = g["blocks"]["proj_l"]["kernel"]
    assert bool(jnp.any(gp != 0))  # talking-head mixers receive gradient
    assert bool(jnp.any(g["blocks_ca"]["q"]["kernel"] != 0))


def test_t2t_ablation_variants():
    """SE / Ghost / Dense T2T ablations (T2TViT/models/t2t_vit_*.py)."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import get_model, t2t_ablations
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    for name, kw in (
        ("t2t_vit_14_se", dict(embed_dim=32, depth=2, num_heads=2,
                               token_dim=16)),
        ("t2t_vit_16_ghost", dict(embed_dim=32, depth=2, num_heads=2,
                                  token_dim=16)),
        ("t2t_vit_dense", dict(embed_dim=32, num_heads=2, token_dim=16,
                               growth_rate=16,
                               dense_block_config=(1, 1))),
    ):
        cfg = get_config(name).replace(img_size=64, num_classes=5, **kw)
        assert get_model(cfg) is t2t_ablations
        params = t2t_ablations.init_params(jax.random.PRNGKey(1), cfg)
        out = t2t_ablations.apply(params, x, cfg, train=True)
        assert out.logits.shape == (2, 5), name
        assert bool(jnp.all(jnp.isfinite(out.logits))), name
    # dense grows channels: 32 + 1*16 -> transition halves -> +16
    cfg = get_config("t2t_vit_dense").replace(
        img_size=64, num_classes=5, embed_dim=32, num_heads=2,
        token_dim=16, growth_rate=16, dense_block_config=(1, 1))
    params = t2t_ablations.init_params(jax.random.PRNGKey(1), cfg)
    assert params["head"]["kernel"].shape[0] == (32 + 16) // 2 + 16


def test_t2t_dense_is_trainable():
    """Regression: dense-variant params carried string/int leaves that
    broke jax.tree.map and grad — every training driver crashed."""
    from uvc_tpu.baselines.finetune import (build_baseline_step,
                                            create_baseline_state)
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import t2t_ablations
    from uvc_tpu.train.state import TrainHParams
    cfg = get_config("t2t_vit_dense").replace(
        img_size=64, num_classes=5, embed_dim=32, num_heads=2,
        token_dim=16, growth_rate=16, dense_block_config=(1, 1))
    params = t2t_ablations.init_params(jax.random.PRNGKey(0), cfg)
    # tree.map must work (this used to raise on '<U5' leaves)
    jax.tree.map(jnp.copy, params)
    thp = TrainHParams(num_classes=5, t_total=10, warmup_steps=1,
                       compute_dtype=jnp.float32, distillation_type=None,
                       mixup=0.0, cutmix=0.0)
    state = create_baseline_state(params, thp)
    step = build_baseline_step(cfg, thp, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y = jnp.zeros((2,), jnp.int32)
    state, m = step(state, None, None, x, y, jax.random.PRNGKey(2),
                    jnp.asarray(-1.0))
    state, m = step(state, None, None, x, y, jax.random.PRNGKey(3),
                    jnp.asarray(-1.0))
    assert np.isfinite(float(m["loss"]))
