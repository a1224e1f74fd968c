"""Capstone integration: learn -> post-train -> physically compact.

Runs the full production pipeline on a learnable synthetic task (tiny
config): stage-1 joint search must reach high accuracy, stage-2 must
fine-tune under frozen masks, and the compacted serving model must
reproduce the masked model's predictions exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.configs import get_config
from uvc_tpu.data.pipeline import ArrayLoader, normalize_on_device
from uvc_tpu.infer.compact import apply_compact, compact_model
from uvc_tpu.models import vit
from uvc_tpu.train.stage1 import run_stage1
from uvc_tpu.train.stage2 import run_stage2
from uvc_tpu.train.state import TrainHParams
from uvc_tpu.utils.logging import MetricLogger

CFG = get_config("testing").replace(embed_dim=16, num_heads=2, depth=2,
                                    num_classes=4)


def _dataset(rng, n):
    ys = rng.integers(0, 4, n)
    yy, xx = np.mgrid[0:32, 0:32]
    imgs = np.empty((n, 32, 32, 3), np.uint8)
    for i, c in enumerate(ys):
        base = np.sin(xx / (1 + c)) * 100 + 127
        img = np.stack([base] * 3, -1) + rng.normal(0, 30, (32, 32, 3))
        imgs[i] = img.clip(0, 255).astype(np.uint8)
    return imgs, ys.astype(np.int32)


def test_full_pipeline_learns_and_compacts(tmp_path):
    rng = np.random.default_rng(0)
    xtr, ytr = _dataset(rng, 512)
    xte, yte = _dataset(rng, 128)
    train = ArrayLoader(xtr, ytr, 64, train=True, img_size=32)
    test = ArrayLoader(xte, yte, 64, train=False, img_size=32)

    hp = MinimaxHParams(budget=0.6, enable_patch_gating=0,
                        gating_interval=4, zlr_schedule=(5,))
    thp = TrainHParams(num_classes=4, t_total=8 * 6, warmup_steps=4,
                       num_epochs=6, warmup_epochs=2, learning_rate=2e-3,
                       mixup=0.0, cutmix=0.0, smoothing=0.0,
                       distillation_type=None, compute_dtype=jnp.float32)
    logger = MetricLogger(str(tmp_path), "s1")
    r1 = run_stage1(CFG, hp, thp, train_loader=train, test_loader=test,
                    output_dir=str(tmp_path), name="s1",
                    save_checkpoints=False, logger=logger)
    assert r1.best_acc > 0.5, f"stage-1 failed to learn: {r1.best_acc}"

    thp2 = TrainHParams(num_classes=4, t_total=16, warmup_steps=2,
                        num_epochs=2, learning_rate=1e-3, mixup=0.0,
                        cutmix=0.0, smoothing=0.0, distillation_type=None,
                        compute_dtype=jnp.float32)
    r2 = run_stage2(CFG, hp, thp2, params=r1.state.params, masks=r1.masks,
                    train_loader=train, test_loader=test,
                    output_dir=str(tmp_path), name="s2", eval_every=0,
                    save_checkpoints=False,
                    logger=MetricLogger(str(tmp_path), "s2"))
    assert r2.best_acc > 0.5, f"stage-2 lost accuracy: {r2.best_acc}"

    # compact and compare predictions against the masked dense model
    params = r2.state.params
    g = params["block_gating"]
    keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
    gating = jnp.stack([1.0 - keep, keep], axis=-1)
    layers, top = compact_model(params, r1.masks, CFG)
    xb = normalize_on_device(jnp.asarray(xte[:64]))
    ref = vit.apply(params, xb, CFG, gating_distrib=gating, masks=r1.masks,
                    train=False, dtype=jnp.float32)
    out = apply_compact(layers, top, xb, CFG, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(out.logits), -1),
        np.argmax(np.asarray(ref.logits), -1))
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), rtol=2e-4,
                               atol=2e-4)


def test_eval_sharding_is_exhaustive(tmp_path):
    """Eval must cover every image exactly once globally even when the
    dataset size divides into neither the process count nor the batch size
    (the reference drops the remainder per rank, or duplicates with
    --dist-eval: Baseline_pruning/main.py:221-227).  Padding rows carry
    label -1 and zero pixels."""
    import numpy as np
    from PIL import Image

    from uvc_tpu.data.pipeline import ArrayLoader, FolderLoader

    root = tmp_path / "val" / "c0"
    root.mkdir(parents=True)
    n = 10
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(root / f"{i}.jpg", quality=95)

    for pcount in (1, 3):
        total_valid = 0
        lens = []
        for pid in range(pcount):
            ld = FolderLoader(str(tmp_path / "val"), 4, train=False,
                              img_size=32, num_workers=2, pid=pid,
                              pcount=pcount)
            lens.append(len(ld))
            batches = list(ld)
            assert len(batches) == len(ld)
            for x, y in batches:
                assert x.shape == (4, 32, 32, 3)   # static batch shape
                total_valid += int((y >= 0).sum())
                assert np.all(x[y < 0] == 0)
        assert total_valid == n, (pcount, total_valid)
        assert len(set(lens)) == 1   # every process runs the same steps

    xs = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    ys = np.arange(n).astype(np.int32)
    for pcount in (1, 3):
        got = []
        for pid in range(pcount):
            ld = ArrayLoader(xs, ys, 4, train=False, img_size=32,
                             pid=pid, pcount=pcount)
            for x, y in ld:
                got.extend(int(v) for v in y if v >= 0)
        assert sorted(got) == list(range(n)), (pcount, sorted(got))


def test_eval_step_masks_padding():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit
    from uvc_tpu.train.state import TrainHParams
    from uvc_tpu.train.step import build_eval_step

    cfg = get_config("testing")
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    hp = MinimaxHParams(enable_patch_gating=0)
    thp = TrainHParams(num_classes=cfg.num_classes,
                       compute_dtype=jnp.float32)
    step = build_eval_step(cfg, hp, thp, masked=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 32, 32, 3))
    y = jnp.array([1, 2, 3, -1, -1, -1], jnp.int32)
    m = step(params, None, x, y, jax.random.PRNGKey(2))
    assert int(m["count"]) == 3
    assert 0 <= int(m["correct"]) <= 3
    assert np.isfinite(float(m["loss_sum"]))
