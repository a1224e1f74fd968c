"""Baseline pruning suite tests (the reference ships none — SURVEY.md §4):
scorer/threshold semantics against hand-computed values, GMP schedule math
(engine.py:24-27), structured SP masks, masked finetuning invariants, and
RASampler index properties (samplers.py:8-59)."""

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.baselines import pruning
from uvc_tpu.baselines.gmp import GMPSchedule, cubic_sparsity
from uvc_tpu.configs import get_config
from uvc_tpu.data.pipeline import ra_sampler_indices
from uvc_tpu.models import vit

CFG = get_config("testing")


def _params(seed=0):
    p = vit.init_params(jax.random.PRNGKey(seed), CFG)
    # zero-init head (reference parity) blocks all backbone gradients —
    # gradient-based scorers need a live head, as any pretrained model has
    p["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(seed + 100), p["head"]["kernel"].shape) * 0.1
    return p


def test_magnitude_global_threshold_density():
    params = _params()
    scores = pruning.magnitude_scores(params)
    masks = pruning.global_threshold_mask(scores, 0.5)
    remain = pruning.mask_sparsity(masks)
    # kth-value threshold keeps ~density of weights (ties break down)
    assert 0.4 < remain <= 0.6
    # masks only on maskable leaves
    assert masks["blocks"]["ln1"]["scale"] is None
    assert masks["blocks"]["qkv"]["kernel"] is not None


def test_local_threshold_per_leaf():
    params = _params()
    scores = pruning.magnitude_scores(params)
    masks = pruning.local_threshold_mask(scores, 0.5)
    m = masks["blocks"]["qkv"]["kernel"]
    frac = float(jnp.mean(m))
    assert 0.4 < frac <= 0.6


def test_apply_weight_masks_zeroes():
    params = _params()
    masks = pruning.identity_masks(params)
    masks["blocks"]["fc1"]["kernel"] = \
        jnp.zeros_like(params["blocks"]["fc1"]["kernel"])
    mp = pruning.apply_weight_masks(params, masks)
    assert float(jnp.sum(jnp.abs(mp["blocks"]["fc1"]["kernel"]))) == 0.0
    # unmasked leaves untouched
    np.testing.assert_allclose(mp["blocks"]["qkv"]["kernel"],
                               params["blocks"]["qkv"]["kernel"])


def test_synflow_runs_and_hits_density():
    params = _params()

    def forward_sum(p):
        ones = jnp.ones((1, CFG.img_size, CFG.img_size, CFG.in_chans))
        out = vit.apply(p, ones, CFG, train=False)
        return jnp.sum(out.logits)

    _, masks = pruning.synflow_scores(params, forward_sum, 0.5, epochs=4)
    remain = pruning.mask_sparsity(masks)
    assert 0.3 < remain <= 0.7


def test_taylor_scores_accumulate():
    params = _params()

    def loss_fn(p, x, y):
        out = vit.apply(p, x, CFG, train=True)
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, CFG.img_size, CFG.img_size, CFG.in_chans))
    y = jnp.zeros((2,), jnp.int32)
    scores = pruning.taylor_scores(params, loss_fn, [(x, y), (x, y)])
    s = scores["blocks"]["qkv"]["kernel"]
    assert s is not None and bool(jnp.all(s >= 0))
    assert float(jnp.max(s)) > 0


def test_sp_structured_masks_counts():
    cfg = CFG
    params = _params()
    grads = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape), params)
    m = pruning.sp_structured_masks(params, grads, cfg, 0.5, 0.5)
    # testing config: 2 heads, keep 1 per layer
    assert m["attn"].shape == (cfg.depth, cfg.num_heads)
    np.testing.assert_allclose(np.sum(np.asarray(m["attn"]), axis=1),
                               max(int(0.5 * cfg.num_heads), 1))
    keep_c = max(int(0.5 * cfg.mlp_hidden), 1)
    np.testing.assert_allclose(np.sum(np.asarray(m["mlp"]), axis=1), keep_c)
    wm = pruning.head_masks_to_weight_masks(m["attn"], m["mlp"], params, cfg)
    # q/k/v blocks share the head pattern
    qkv = np.asarray(wm["blocks"]["qkv"]["kernel"])  # [L, D, 3D]
    d = cfg.embed_dim
    np.testing.assert_allclose(qkv[:, :, :d], qkv[:, :, d:2 * d])


def test_cubic_schedule_reference_math():
    # engine.py:24-27: at t = t_0 + n*dt the coef hits 0 => full sparsity
    assert abs(cubic_sparsity(0.0, 0.5, 1000 + 10 * 500, 1000, 10, 500)
               - 0.5) < 1e-9
    # monotone increasing in t
    a = cubic_sparsity(0.0, 0.5, 1500, 1000, 10, 500)
    b = cubic_sparsity(0.0, 0.5, 3000, 1000, 10, 500)
    assert 0 < a < b < 0.5


def test_gmp_schedule_triggers():
    g = GMPSchedule(sparsity=0.5, t_start=10, delta_t=5, pruning_times=2)
    params = _params()
    assert g.maybe_prune(10, params) is None        # not yet (> t_start)
    m1 = g.maybe_prune(15, params)
    assert m1 is not None and g.events == 1
    assert g.maybe_prune(16, params) is None
    m2 = g.maybe_prune(20, params)
    assert m2 is not None and g.events == 2
    assert g.maybe_prune(25, params) is None        # exhausted
    # later event prunes strictly more
    assert pruning.mask_sparsity(m2) < pruning.mask_sparsity(m1)


def test_masked_finetune_effective_weights_stay_zero():
    from uvc_tpu.baselines.finetune import (build_baseline_step,
                                            create_baseline_state)
    from uvc_tpu.train.state import TrainHParams
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=10,
                       warmup_steps=1, compute_dtype=jnp.float32,
                       distillation_type=None, mixup=0.0, cutmix=0.0)
    params = _params()
    masks = pruning.global_threshold_mask(
        pruning.magnitude_scores(params), 0.5)
    state = create_baseline_state(params, thp, ema_decay=0.9)
    step = build_baseline_step(CFG, thp, ema_decay=0.9, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, CFG.img_size, CFG.img_size, CFG.in_chans))
    y = jnp.zeros((4,), jnp.int32)
    for i in range(3):
        state, metrics = step(state, None, masks, x, y,
                              jax.random.PRNGKey(i), jnp.asarray(-1.0))
    assert np.isfinite(float(metrics["loss"]))
    eff = pruning.apply_weight_masks(state.params, masks)
    m = np.asarray(masks["blocks"]["qkv"]["kernel"])
    w = np.asarray(eff["blocks"]["qkv"]["kernel"])
    assert np.all(w[m == 0] == 0)
    # ema tracked: lags behind the live params (tiny lr => tiny gap)
    assert state.ema_params is not None
    gap = np.max(np.abs(
        np.asarray(state.ema_params["blocks"]["qkv"]["kernel"])
        - np.asarray(state.params["blocks"]["qkv"]["kernel"])))
    assert gap > 0


def test_masks_flat_roundtrip():
    params = _params()
    masks = pruning.global_threshold_mask(
        pruning.magnitude_scores(params), 0.5)
    flat = pruning.masks_to_flat(masks, params)
    back = pruning.masks_from_flat(flat, params)
    np.testing.assert_allclose(np.asarray(back["blocks"]["qkv"]["kernel"]),
                               np.asarray(masks["blocks"]["qkv"]["kernel"]))
    assert back["blocks"]["ln1"]["scale"] is None


def test_ra_sampler_properties():
    n, reps = 512, 4
    per_rank = [ra_sampler_indices(n, epoch=3, rank=r, num_replicas=reps)
                for r in range(reps)]
    expect_len = int(n // 256 * 256 / reps)
    for idx in per_rank:
        assert len(idx) == expect_len
    # repeated augmentation: across all ranks each index appears <= 3 times
    allidx = np.concatenate(per_rank)
    _, counts = np.unique(allidx, return_counts=True)
    assert counts.max() <= 3
    # deterministic per epoch
    again = ra_sampler_indices(n, epoch=3, rank=0, num_replicas=reps)
    np.testing.assert_array_equal(per_rank[0], again)


def test_baseline_resume_roundtrip(tmp_path):
    """Full baseline resume (regression: msgpack restores plain dicts that
    must be rebuilt into the optax NamedTuple template)."""
    from uvc_tpu.baselines.finetune import run_baseline
    from uvc_tpu.data.pipeline import SyntheticLoader
    from uvc_tpu.train.state import TrainHParams
    thp = TrainHParams(num_classes=10, t_total=20, warmup_steps=1,
                       compute_dtype=jnp.float32, distillation_type=None,
                       num_epochs=1)
    params = _params(0)
    train = SyntheticLoader(4, num_batches=2, img_size=CFG.img_size,
                            num_classes=10)
    masks = pruning.global_threshold_mask(
        pruning.magnitude_scores(params), 0.5)
    r1 = run_baseline(CFG, thp, train_loader=train, test_loader=None,
                      params=params, wmasks=masks, ema_decay=0.9,
                      output_dir=str(tmp_path), name="a")
    ck = str(tmp_path / "a" / f"{CFG.name}_baseline_0.ckpt")
    import dataclasses
    thp2 = dataclasses.replace(thp, num_epochs=2)
    r2 = run_baseline(CFG, thp2, train_loader=train, test_loader=None,
                      params=params, ema_decay=0.9,
                      output_dir=str(tmp_path), name="b", resume=ck)
    assert int(r2.state.step) == 4          # 2 resumed + 2 new
    # masks survived the roundtrip
    assert r2.masks is not None
    np.testing.assert_allclose(
        np.asarray(r2.masks["blocks"]["qkv"]["kernel"]),
        np.asarray(masks["blocks"]["qkv"]["kernel"]))


def test_eval_crop_384_in_bounds(tmp_path):
    """384-px eval must not center-crop beyond the resized image
    (regression: resize_to was hardcoded to 256)."""
    from PIL import Image
    from uvc_tpu.data.pipeline import eval_resize_for, load_eval_image
    assert eval_resize_for(224) == 256
    assert eval_resize_for(384) >= 384
    p = str(tmp_path / "img.jpg")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 256, (500, 400, 3), np.uint8)).save(p)
    out = load_eval_image(p, 384)
    assert out.shape == (384, 384, 3)
    # no zero-padded border (the old bug produced black margins)
    assert out[:, 0].mean() > 10 and out[:, -1].mean() > 10
    assert out[0, :].mean() > 10 and out[-1, :].mean() > 10


def test_inat_reader(tmp_path):
    """INat annotation-json reader on a synthesized mini dataset
    (Baseline_pruning/datasets.py:62-100 format)."""
    import json
    from uvc_tpu.data.pipeline import FolderLoader, load_inat
    root = tmp_path
    cats = [{"name": "plantae"}, {"name": "aves"}, {"name": "fungi"}]
    (root / "categories.json").write_text(json.dumps(cats))
    imgs, anns = [], []
    for i, cid in enumerate([2, 0, 2, 1]):
        imgs.append({"file_name": f"train_val2018/x/{cid}/img{i}.jpg"})
        anns.append({"category_id": cid})
    (root / "train2018.json").write_text(
        json.dumps({"images": imgs, "annotations": anns}))
    (root / "val2018.json").write_text(
        json.dumps({"images": imgs[:2], "annotations": anns[:2]}))
    paths, labels, ncls = load_inat(str(root), train=True)
    assert ncls == 3
    assert len(paths) == 4
    # dense remapping in first-seen order: cid 2 -> 0, cid 0 -> 1, cid 1 -> 2
    np.testing.assert_array_equal(labels, [0, 1, 0, 2])
    vpaths, vlabels, _ = load_inat(str(root), train=False)
    assert len(vpaths) == 2
    # pre-resolved tuple plugs into FolderLoader
    ld = FolderLoader((paths, labels), 2, train=True, img_size=32)
    assert len(ld.classes) == 3


def test_ema_resume_without_saved_ema_warm_starts(tmp_path):
    """Resuming with --model_ema from a checkpoint that has no ema_params
    must warm-start EMA from the restored weights, not the fresh init."""
    from flax import serialization

    from uvc_tpu.baselines.finetune import (create_baseline_state,
                                            run_baseline)
    from uvc_tpu.data.pipeline import SyntheticLoader
    from uvc_tpu.train.state import TrainHParams
    from uvc_tpu.utils.checkpoint import save_checkpoint

    thp = TrainHParams(num_classes=CFG.num_classes, num_epochs=0,
                       mixup=0.0, cutmix=0.0, compute_dtype=jnp.float32)
    saved_params = _params(7)
    tmpl = create_baseline_state(saved_params, thp)
    ck_path = str(tmp_path / "no_ema.ckpt")
    save_checkpoint(ck_path, {
        "params": saved_params,
        "opt_state": serialization.to_state_dict(tmpl.opt_state),
        "ema_params": {},            # the pre-EMA checkpoint format
        "masks": {}, "step": 5, "epoch": 0, "best_acc": 0.0,
        "gmp_events": 0})

    train = SyntheticLoader(4, num_batches=1, img_size=CFG.img_size,
                            num_classes=CFG.num_classes, seed=0)
    result = run_baseline(CFG, thp, train_loader=train, test_loader=None,
                          params=_params(0), ema_decay=0.99,
                          resume=ck_path, save_checkpoints=False,
                          output_dir=str(tmp_path), name="ema_resume")
    assert result.state.ema_params is not None
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 result.state.ema_params, result.state.params)
    # and NOT the _params(0) init it would have kept before the fix
    assert not np.allclose(
        np.asarray(result.state.ema_params["head"]["kernel"]),
        np.asarray(_params(0)["head"]["kernel"]))


def test_baseline_trainer_learns_with_gmp(tmp_path):
    """The baseline trainer LEARNS (not just runs): dense fine-tune on the
    procedural generalization task reaches well-above-chance held-out
    accuracy, and the GMP variant reaches its target sparsity while still
    classifying (reference capability: Baseline_pruning/main.py + the
    engine.py cubic schedule)."""
    import jax

    from uvc_tpu.baselines.finetune import run_baseline
    from uvc_tpu.baselines.gmp import GMPSchedule
    from uvc_tpu.baselines.pruning import mask_sparsity
    from uvc_tpu.configs import get_config
    from uvc_tpu.data.pipeline import ProceduralLoader
    from uvc_tpu.models import vit
    from uvc_tpu.train.state import TrainHParams

    cfg = get_config("testing").replace(
        img_size=32, embed_dim=32, num_heads=2, depth=2, num_classes=5)
    train = ProceduralLoader(32, num_batches=20, img_size=32,
                             num_classes=5, train=True, seed=4)
    test = ProceduralLoader(32, num_batches=2, img_size=32,
                            num_classes=5, train=False, seed=4)
    thp = TrainHParams(learning_rate=2e-3, warmup_steps=5, t_total=120,
                       num_epochs=6, num_classes=5, mixup=0.0, cutmix=0.0,
                       smoothing=0.0, distillation_type="none",
                       compute_dtype=jnp.float32)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)

    dense = run_baseline(cfg, thp, train_loader=train, test_loader=test,
                         params=params, seed=0, output_dir=str(tmp_path),
                         name="dense", save_checkpoints=False)
    assert dense.best_acc > 0.6, f"dense acc {dense.best_acc} ~ chance 0.2"

    gmp = GMPSchedule(sparsity=0.5, t_start=20, delta_t=10,
                      pruning_times=6)
    pruned = run_baseline(cfg, thp, train_loader=train, test_loader=test,
                          params=params, gmp=gmp, seed=0,
                          output_dir=str(tmp_path), name="gmp",
                          save_checkpoints=False)
    sp = mask_sparsity(pruned.masks)
    assert abs(sp - 0.5) < 0.05, f"GMP sparsity {sp} != 0.5"
    assert pruned.best_acc > 0.5
