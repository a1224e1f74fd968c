"""Deployment demonstration: train -> compress -> compact -> AOT serve.

Runs the complete user journey on the procedural dataset (no external
data needed) at toy scale:

  1. stage-1 UVC on a small ViT with token selection (trains the token
     scorer the serving path uses),
  2. physical compaction (pruned heads/units sliced out, skipped blocks
     dropped, tokens top-k-slimmed),
  3. StableHLO export via jax.export — the serving artifact needs only
     jax on the load side, no uvc_tpu model code,
  4. reload + classify a batch, comparing compact vs masked-dense logits.

  $ python examples/serving_demo.py
  ...
  compact model: K/L blocks kept, NN.N% of dense FLOPs
  serving artifact: batches [8] -> logits (8, 10), agree with
  masked-dense top-1 on 8/8

The real CLI equivalents are `python -m uvc_tpu.cli.joint_train` and
`python -m uvc_tpu.cli.export_compact --export_stablehlo` (MIGRATING.md).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.configs import get_config
from uvc_tpu.data.pipeline import ProceduralLoader
from uvc_tpu.infer.compact import (apply_compact, compact_flops_fraction,
                                   compact_model)
from uvc_tpu.infer.export import export_serving, load_serving, save_serving
from uvc_tpu.train.stage1 import run_stage1
from uvc_tpu.train.state import TrainHParams
from uvc_tpu.utils.logging import MetricLogger


def main():
    cfg = get_config("testing").replace(
        img_size=32, embed_dim=64, num_heads=2, depth=4, mlp_ratio=4.0,
        num_classes=10)
    ratio = 0.7
    train = ProceduralLoader(64, num_batches=30, img_size=32,
                             num_classes=10, train=True, seed=0)
    test = ProceduralLoader(64, num_batches=4, img_size=32,
                            num_classes=10, train=False, seed=0)

    hp = MinimaxHParams(budget=0.6, gating_weight=5e-4, gating_interval=5,
                        zlr_schedule=(1, 3, 5, 7, 9),
                        enable_patch_gating=2, patch_ratio=ratio)
    thp = TrainHParams(learning_rate=1e-3, warmup_lr=1e-3, warmup_steps=10,
                       t_total=10 * 30, num_epochs=10, warmup_epochs=2,
                       num_classes=10, mixup=0.0, cutmix=0.0,
                       distillation_type="none",
                       compute_dtype=jnp.float32)
    out = tempfile.mkdtemp(prefix="serving_demo_")
    result = run_stage1(cfg, hp, thp, train_loader=train, test_loader=test,
                        seed=0, output_dir=out, name="demo",
                        save_checkpoints=False, logger=MetricLogger(out, "demo"))
    print(f"stage-1 done: best acc {result.best_acc * 100:.1f}%")

    params = jax.tree.map(np.asarray, result.state.params)
    layers, top = compact_model(params, result.masks, cfg)
    frac = compact_flops_fraction(layers, cfg, token_ratio=ratio)
    print(f"compact model: {len(layers)}/{cfg.depth} blocks kept, "
          f"{frac * 100:.1f}% of dense FLOPs")

    path = out + "/serve.npz"
    save_serving(path, export_serving(layers, top, cfg, batch_sizes=(8,),
                                      token_ratio=ratio, dtype=jnp.float32))
    model = load_serving(path)          # needs only jax from here on

    from uvc_tpu.data.pipeline import normalize_on_device
    x, y = next(iter(test))
    x8 = normalize_on_device(jnp.asarray(x[:8]))
    served = np.asarray(jax.device_get(model(np.asarray(x8))))
    dense = apply_compact(layers, top, x8, cfg, dtype=jnp.float32,
                          token_ratio=ratio)
    dense_fused = np.asarray(0.5 * (dense.logits + dense.logits_kd)
                             if cfg.distilled else dense.logits)
    agree = int((served.argmax(-1) == dense_fused.argmax(-1)).sum())
    correct = int((served.argmax(-1) == y[:8]).sum())
    print(f"serving artifact: batches {model.batch_sizes} -> logits "
          f"{served.shape}, agree with masked-dense top-1 on {agree}/8, "
          f"correct on {correct}/8")


if __name__ == "__main__":
    main()
