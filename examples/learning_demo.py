"""End-to-end learning demonstration (no external data needed).

Trains DeiT-Tiny(depth 6, 64px) with the full stage-1 UVC loop on a
learnable synthetic task (10 classes of distinct frequency patterns) and
verifies the system learns while compressing:

  $ python examples/learning_demo.py
  ...
  Validation @ step 128: ... acc 100.000%
  Real FLOPs: ~75%    BEST ACC: 1.0

Measured on a single v5e chip: reaches 100% val accuracy in 8 epochs
(~1 min) while the minimax engine prunes to ~75% of dense FLOPs under a
0.6 budget — the joint weight+architecture optimization, gating, masking,
eval, and reporting paths all exercised with real gradient signal.
"""

import jax.numpy as jnp
import numpy as np

from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.configs import get_config
from uvc_tpu.data.pipeline import ArrayLoader
from uvc_tpu.train.stage1 import run_stage1
from uvc_tpu.train.state import TrainHParams
from uvc_tpu.utils.logging import MetricLogger


def make_dataset(rng, n):
    ys = rng.integers(0, 10, n)
    yy, xx = np.mgrid[0:64, 0:64]
    imgs = np.empty((n, 64, 64, 3), np.uint8)
    for i, c in enumerate(ys):
        base = np.sin(xx / (2 + c)) * np.cos(yy / (1 + c // 2)) * 100 + 127
        img = np.stack([base] * 3, -1) + rng.normal(0, 40, (64, 64, 3))
        imgs[i] = img.clip(0, 255).astype(np.uint8)
    return imgs, ys.astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    xtr, ytr = make_dataset(rng, 2048)
    xte, yte = make_dataset(rng, 512)
    train = ArrayLoader(xtr, ytr, 128, train=True, img_size=64)
    test = ArrayLoader(xte, yte, 128, train=False, img_size=64)

    cfg = get_config("deit_tiny_patch16_224").replace(
        img_size=64, num_classes=10, depth=6)
    hp = MinimaxHParams(budget=0.6, enable_patch_gating=0,
                        gating_interval=10, zlr_schedule=(5,))
    thp = TrainHParams(num_classes=10, t_total=16 * 8, warmup_steps=10,
                       num_epochs=8, warmup_epochs=2, learning_rate=8e-4,
                       mixup=0.0, cutmix=0.0, smoothing=0.1,
                       distillation_type=None,
                       compute_dtype=jnp.bfloat16)
    res = run_stage1(cfg, hp, thp, train_loader=train, test_loader=test,
                     output_dir="/tmp/uvc_demo", name="demo",
                     save_checkpoints=False,
                     logger=MetricLogger("/tmp/uvc_demo", "demo"))
    print("BEST ACC:", res.best_acc)
    assert res.best_acc > 0.5, "model failed to learn"


if __name__ == "__main__":
    main()
