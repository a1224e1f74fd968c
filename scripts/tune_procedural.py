"""Tune the procedural task's difficulty (VERDICT r3 weak #2).

E2EACC_r03 was saturated: every stage scored 1.0, so the accuracy-delta
gates were vacuous.  This runs ONLY phase A (dense pretrain at the
DeiT-Tiny shape, as scripts/e2e_accuracy.py does) for a grid of
difficulty settings and reports held-out accuracy, to pick settings
where dense lands ~0.90-0.97 — hard enough that compression shows a
real, bounded cost.

Usage: timeout 3600 python scripts/tune_procedural.py [--settings i,j,...]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/tmp/uvc_jaxcache")

STEPS = 100
BATCH = 128
CLASSES = 50
IMG = 64
EPOCHS = 5

# (contrast, noise_mode, jitter, freq)
# round-1 sweep result: ANY jitter collapses learning to near-chance at
# this training budget (0.03-0.09 vs 1.0) — circular shifts of
# non-integer-frequency templates create seam artifacts, and 500 steps
# can't learn shift invariance regardless.  Jitter stays 0; difficulty
# comes from spectrally-matched (lowpass) noise at decreasing contrast.
# round-2 sweep result (indices 1-5): 0.45 -> 0.958, 0.35 -> 0.895,
# 0.28 -> 0.469, 0.22 -> 0.336, 0.17 -> 0.069.  Picked contrast 0.45
# (in the 0.90-0.97 band) for scripts/e2e_accuracy.py HARD.
GRID = [
    (0.55, "white", 0, 4.0),      # r3 settings (saturated: acc 1.0)
    (0.45, "lowpass", 0, 4.0),
    (0.35, "lowpass", 0, 4.0),
    (0.28, "lowpass", 0, 4.0),
    (0.22, "lowpass", 0, 4.0),
    (0.17, "lowpass", 0, 4.0),
    (0.40, "lowpass", 0, 4.0),    # round-4 refinement: 0.45 saturates
    (0.38, "lowpass", 0, 4.0),    # by BEST-epoch acc (0.998).  Measured:
                                  # 0.40 -> 0.9594, 0.38 -> 0.9266;
                                  # e2e_accuracy HARD uses 0.38.
    # round-5: per-image contrast SPECTRUM (contrast_range) so accuracy
    # measures the model's decoding threshold and cannot saturate at any
    # training budget (the scalar-contrast task hit 1.0 at the compressed
    # stages, E2EACC_r04_seed1).  Probe with --epochs 25 to see the
    # long-budget ceiling, not just the 5-epoch dense point.
    {"contrast_range": (0.22, 0.45), "noise_mode": "lowpass", "freq": 4.0},
    {"contrast_range": (0.25, 0.48), "noise_mode": "lowpass", "freq": 4.0},
    {"contrast_range": (0.28, 0.52), "noise_mode": "lowpass", "freq": 4.0},
    {"contrast_range": (0.19, 0.42), "noise_mode": "lowpass", "freq": 4.0},
]
# 25-epoch ceiling sweep (r5, seed 0): (0.28,0.52) -> 0.995,
# (0.25,0.48) -> 0.986, (0.22,0.45) -> 0.973 <- e2e pick,
# (0.19,0.42) -> 0.958; the e2e harness needs the long-budget ceiling
# clear of its 0.985 compressed-stage saturation guards.


def run_one(contrast, noise_mode, jitter, freq, *, epochs=EPOCHS,
            contrast_range=None, seed=0):
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.configs import get_config
    from uvc_tpu.data.pipeline import ProceduralLoader
    from uvc_tpu.train.stage1 import run_stage1
    from uvc_tpu.train.state import TrainHParams
    from uvc_tpu.utils.logging import MetricLogger

    cfg = get_config("deit_tiny_distilled_patch16_224").replace(
        img_size=IMG, num_classes=CLASSES)
    kw = dict(num_classes=CLASSES, img_size=IMG, contrast=contrast,
              noise_mode=noise_mode, jitter=jitter, freq=freq, seed=seed,
              contrast_range=contrast_range)
    train = ProceduralLoader(BATCH, num_batches=STEPS, train=True, **kw)
    test = ProceduralLoader(BATCH, num_batches=5, train=False, **kw)
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    hp = MinimaxHParams(enable_patch_gating=0, enable_pruning=False)
    thp = TrainHParams(
        learning_rate=1e-3, warmup_lr=1e-3, weight_decay=0.05,
        warmup_steps=0, t_total=epochs * STEPS, num_epochs=epochs,
        warmup_epochs=epochs, num_classes=CLASSES, mixup=0.0, cutmix=0.0,
        smoothing=0.1, distillation_type="none", compute_dtype=dtype)
    out = tempfile.mkdtemp(prefix="tune_proc_")
    t0 = time.time()
    res = run_stage1(cfg, hp, thp, train_loader=train, test_loader=test,
                     seed=seed, output_dir=out, name="dense",
                     eval_each_epoch=True, save_checkpoints=False,
                     logger=MetricLogger(out, "dense"))
    return float(res.best_acc), time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", default=None,
                    help="comma-separated GRID indices (default: all)")
    ap.add_argument("--epochs", type=int, default=EPOCHS,
                    help="training epochs (use ~25 to probe the "
                         "long-budget ceiling the e2e pipeline reaches)")
    ap.add_argument("--seed", type=int, default=0)
    opts = ap.parse_args()
    idxs = (list(range(len(GRID))) if opts.settings is None
            else [int(i) for i in opts.settings.split(",")])
    rows = []
    for i in idxs:
        g = GRID[i]
        if isinstance(g, dict):
            spec = dict(contrast=g.get("contrast", 0.0),
                        noise_mode=g.get("noise_mode", "lowpass"),
                        jitter=g.get("jitter", 0),
                        freq=g.get("freq", 4.0),
                        contrast_range=g.get("contrast_range"))
        else:
            c, nm, j, f = g
            spec = dict(contrast=c, noise_mode=nm, jitter=j, freq=f,
                        contrast_range=None)
        acc, dt = run_one(spec["contrast"], spec["noise_mode"],
                          spec["jitter"], spec["freq"],
                          epochs=opts.epochs,
                          contrast_range=spec["contrast_range"],
                          seed=opts.seed)
        row = {**spec, "epochs": opts.epochs, "seed": opts.seed,
               "dense_acc": round(acc, 4), "wall_s": round(dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"grid": rows}))


if __name__ == "__main__":
    main()
