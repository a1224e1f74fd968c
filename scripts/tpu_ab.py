"""Quick on-chip A/B of the stage-1 step across kernel variants.

Usage:
  timeout 1200 python scripts/tpu_ab.py [model ...]     # default: small

Env:
  UVC_FUSED_MLP=0|1   (read by models/vit.py at import)

Prints one line per model: img/s + MFU for the CURRENT env configuration.
Use two invocations to A/B (the flag is read at import time).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

MODELS = {
    "tiny": ("deit_tiny_patch16_224", 512, 20),
    "small": ("deit_small_patch16_224", 256, 20),
    "base": ("deit_base_patch16_224", 128, 10),
    "t2t": ("t2t_vit_14", 256, 10),
}


def main():
    names = sys.argv[1:] or ["small"]
    import jax
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"backend={jax.default_backend()} "
          f"UVC_FUSED_MLP={os.environ.get('UVC_FUSED_MLP', '1')}")
    for name in names:
        cfg, batch, steps = MODELS[name]
        if not on_tpu:
            batch, steps = 8, 2
        r = bench.bench_model(cfg, batch, steps, on_tpu=on_tpu)
        print(f"{name:6s} B={batch:4d}  {r['img_per_sec']:8.1f} img/s  "
              f"mfu={r['mfu']:.4f}", flush=True)


if __name__ == "__main__":
    main()
