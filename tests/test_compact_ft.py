"""Compact stage-2 fine-tuning (uvc_tpu/train/compact_ft.py): training at
physically sliced shapes must follow EXACTLY the masked-dense stage-2
update trajectory on the kept coordinates (the reference fine-tunes at
dense shapes for the whole 150-epoch job: post_train.py:357-360)."""

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.compress.masks import build_masks
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.configs import get_config
from uvc_tpu.models import vit
from uvc_tpu.train.compact_ft import (apply_compact_ft,
                                      build_compact_stage2_step,
                                      compact_train_tree, scatter_to_dense)
from uvc_tpu.train.state import TrainHParams, create_train_state
from uvc_tpu.train.step import build_stage2_step

CFG = get_config("testing").replace(embed_dim=16, num_heads=2, depth=3,
                                    num_classes=7, distilled=True)


def _setup():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    params["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(5), params["head"]["kernel"].shape) * 0.1
    params["head_dist"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(6), params["head_dist"]["kernel"].shape) * 0.1
    # prune 1 of 2 heads in layer 0, within-head dims in layer 1, half the
    # mlp units everywhere; gating drops block 2 (stage-2 hard decision)
    s = jnp.array([[1.0, 32.0], [0.0, 32.0], [0.0, 32.0]])
    r = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 0.0]])
    masks = build_masks(params, s, r, CFG)
    params["block_gating"] = jnp.array(
        [[-1.0, 1.0], [-1.0, 1.0], [1.0, -1.0]])
    return params, masks


def _hard_gating(params):
    g = params["block_gating"]
    keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
    return jnp.stack([1.0 - keep, keep], axis=-1)


def _thp():
    # f32 compute so compact-vs-dense differences measure op-order noise,
    # not bf16 rounding; mixup off for a deterministic base loss
    return TrainHParams(num_classes=CFG.num_classes, t_total=10,
                        warmup_steps=0, mixup=0.0, cutmix=0.0,
                        smoothing=0.1, compute_dtype=jnp.float32)


def test_compact_ft_forward_matches_masked_dense():
    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    ref = vit.apply(params, x, CFG, gating_distrib=_hard_gating(params),
                    masks=masks, train=True, dtype=jnp.float32)
    ctree, meta = compact_train_tree(params, masks, CFG)
    assert len(ctree["layers"]) == 2             # block 2 dropped
    out = apply_compact_ft(ctree, meta, x, CFG, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.logits_kd),
                               np.asarray(ref.logits_kd),
                               rtol=2e-4, atol=2e-4)


def test_compact_ft_token_drop_matches_physical_dense():
    """apply_compact_ft's token drop is the same PHYSICAL gather as
    vit.apply(patch_physical=True) and serving's apply_compact — compact
    fine-tuning, dense stage-2, and the serving artifact all share one
    token-drop semantics (no ghost rows anywhere)."""
    params, masks = _setup()
    x = jax.random.normal(jax.random.PRNGKey(7),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    ratio = 0.7
    ref = vit.apply(params, x, CFG, gating_distrib=_hard_gating(params),
                    masks=masks, patch_gate_mode=2, patch_ratio=ratio,
                    rng=None, patch_physical=True, train=True,
                    dtype=jnp.float32)
    ctree, meta = compact_train_tree(params, masks, CFG)
    out = apply_compact_ft(ctree, meta, x, CFG, dtype=jnp.float32,
                           token_ratio=ratio)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.logits_kd),
                               np.asarray(ref.logits_kd),
                               rtol=2e-4, atol=2e-4)


def test_compact_step_matches_dense_on_kept_coords():
    """One full optimizer step: compact(dense_step(params)) must equal
    compact_step(compact(params)) — grads, clipping, AdamW, and weight
    decay all agree on the kept coordinates."""
    params, masks = _setup()
    hp = MinimaxHParams()
    thp = _thp()
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (8, CFG.img_size, CFG.img_size, CFG.in_chans))
    y = jnp.arange(8) % CFG.num_classes
    key = jax.random.PRNGKey(3)
    teacher = vit.init_params(jax.random.PRNGKey(9), CFG)

    dense_step = build_stage2_step(CFG, hp, thp, donate=False)
    state_d = create_train_state(jax.tree.map(jnp.copy, params), thp, None)
    state_d, md = dense_step(state_d, teacher, masks, x, y, key)

    ctree, meta = compact_train_tree(params, masks, CFG)
    compact_step = build_compact_stage2_step(CFG, hp, thp, meta,
                                             donate=False)
    state_c = create_train_state(ctree, thp, None)
    state_c, mc = compact_step(state_c, teacher, masks, x, y, key)

    # identical loss and global grad norm: masked coordinates contribute
    # exactly-zero gradients in the dense step
    np.testing.assert_allclose(float(mc["loss"]), float(md["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mc["grad_norm"]),
                               float(md["grad_norm"]), rtol=1e-5)

    # project the dense result onto the compact layout and compare trees
    ctree_from_dense, _ = compact_train_tree(state_d.params, masks, CFG)
    flat_c = jax.tree_util.tree_flatten_with_path(state_c.params)[0]
    flat_d = dict(jax.tree_util.tree_flatten_with_path(
        ctree_from_dense)[0])
    assert len(flat_c) == len(flat_d)
    for path, leaf in flat_c:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_d[path]),
            rtol=1e-4, atol=1e-6,
            err_msg=f"kept-coordinate drift at {jax.tree_util.keystr(path)}")


def test_compact_step_padding_and_vmask_stay_zero():
    """MLP lane-padding slots have zero grads and zero AdamW moments, so
    they stay identically zero with no re-masking; the within-head-pruned
    proj rows change only by weight decay (zero grads)."""
    params, masks = _setup()
    thp = _thp()
    ctree, meta = compact_train_tree(params, masks, CFG)
    step = build_compact_stage2_step(CFG, MinimaxHParams(), thp, meta,
                                     donate=False)
    state = create_train_state(ctree, thp, None)
    x = jax.random.normal(jax.random.PRNGKey(4),
                          (8, CFG.img_size, CFG.img_size, CFG.in_chans))
    y = jnp.arange(8) % CFG.num_classes
    for i in range(2):
        state, _ = step(state, params, masks, x, y, jax.random.PRNGKey(i))

    orig, _ = compact_train_tree(params, masks, CFG)
    saw_vmasked = False
    for idx, (blk, plan) in enumerate(zip(state.params["layers"],
                                          meta.plans)):
        nk = len(plan["kept_units"])
        fc1 = np.asarray(blk["fc1"]["kernel"])
        fc2 = np.asarray(blk["fc2"]["kernel"])
        assert (fc1[:, nk:] == 0).all(), "fc1 padding drifted"
        assert (fc2[nk:, :] == 0).all(), "fc2 padding drifted"
        vmask = np.asarray(plan["vmask"])
        if (vmask == 0).any():
            saw_vmasked = True
            # masked v/proj rows must not receive gradient updates: after
            # two steps they are the original rows changed by pure decay
            # (|update| = lr * wd * |w| per step — tiny)
            rows = np.nonzero(vmask == 0)[0]
            got = np.asarray(blk["proj"]["kernel"])[rows]
            want = np.asarray(orig["layers"][idx]["proj"]["kernel"])[rows]
            assert np.abs(got - want).max() < 1e-4
    assert saw_vmasked, "setup should include a within-head-pruned layer"


def test_compact_remat_replay_dces_forward_kernels():
    """Same perf invariant as the dense scan
    (test_attention_kernel.py::test_remat_replay_dces_forward_kernels)
    for the compact per-layer checkpoint: with both sublayers as
    custom-VJP Pallas ops and the "attn_out" save policy, the trace must
    hold exactly 4 pallas calls PER LAYER (attn fwd, mlp fwd, mlp bwd,
    attn bwd) — the unrolled layers don't share a scan body, so the count
    scales with kept layers."""
    from uvc_tpu.ops import attention as attn_mod

    params, masks = _setup()
    ctree, meta = compact_train_tree(params, masks, CFG)
    x = jax.random.normal(jax.random.PRNGKey(5),
                          (2, CFG.img_size, CFG.img_size, CFG.in_chans))

    old = attn_mod._FORCE_FUSED_INTERPRET
    attn_mod._FORCE_FUSED_INTERPRET = True
    try:
        def loss(ct):
            out = apply_compact_ft(ct, meta, x, CFG, dtype=jnp.float32)
            return jnp.sum(out.logits ** 2)

        jaxpr = jax.make_jaxpr(jax.value_and_grad(loss))(ctree)
    finally:
        attn_mod._FORCE_FUSED_INTERPRET = old
    n_calls = str(jaxpr).count("pallas_call")
    expect = 4 * len(ctree["layers"])
    assert n_calls == expect, (
        f"expected {expect} pallas calls in the trace, got {n_calls}")


def test_scatter_to_dense_roundtrip():
    """scatter(compact(params)) restores every kept coordinate and leaves
    masked/dropped ones at the template values."""
    params, masks = _setup()
    ctree, meta = compact_train_tree(params, masks, CFG)
    dense = scatter_to_dense(ctree, meta, params, masks)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, params))[0],
            jax.tree_util.tree_flatten_with_path(dense)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_post_train_compact(tmp_path):
    """End-to-end: stage-1 ckpt -> --compact_train stage-2 -> dense-layout
    checkpoints -> resumable."""
    from uvc_tpu.cli.joint_train import main as joint_main
    from uvc_tpu.cli.post_train import main as post_main
    from uvc_tpu.utils.checkpoint import load_checkpoint

    joint_main([
        "--model_type", "testing", "--dataset", "synthetic",
        "--img_size", "32", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--synthetic_steps", "2",
        "--num_epochs", "1", "--warmup_epochs", "1",
        "--post_num_epochs", "0", "--warmup_steps", "1",
        "--enable_patch_gating", "0",
        "--dp", "1", "--output_dir", str(tmp_path), "--name", "s1",
    ])
    ckpt = sorted((tmp_path / "s1").glob("*.ckpt"))[0]
    post_main([
        "--model_type", "testing", "--dataset", "synthetic",
        "--img_size", "32", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--synthetic_steps", "2",
        "--num_epochs", "1", "--enable_patch_gating", "0",
        "--checkpoint_dir", str(ckpt), "--eval_every", "2",
        "--compact_train",
        "--dp", "1", "--output_dir", str(tmp_path), "--name", "s2c",
    ])
    post_ckpts = sorted((tmp_path / "s2c").glob("*post*.ckpt"))
    assert post_ckpts, "compact stage-2 wrote per-epoch checkpoints"
    ck = load_checkpoint(str(post_ckpts[-1]))
    assert bool(np.asarray(ck.get("compact")))
    # dense layout: stacked block tensors survive the scatter
    cfg = get_config("testing")
    assert np.asarray(ck["params"]["blocks"]["qkv"]["kernel"]).shape == (
        cfg.depth, cfg.embed_dim, 3 * cfg.embed_dim)

    # resume the compact run from its own checkpoint (re-compacts params,
    # restores the compact-shaped opt state)
    post_main([
        "--model_type", "testing", "--dataset", "synthetic",
        "--img_size", "32", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--synthetic_steps", "2",
        "--num_epochs", "2", "--enable_patch_gating", "0",
        "--checkpoint_dir", str(ckpt), "--eval_every", "2",
        "--compact_train", "--resume", str(post_ckpts[-1]),
        "--dp", "1", "--output_dir", str(tmp_path), "--name", "s2c2",
    ])
    assert (tmp_path / "s2c2" / "metrics.jsonl").exists()
