"""A/B: stage-2 fine-tune step at masked-dense vs physically compact shapes,
with and without the physical token drop.

The reference's stage-2 (its longest job: 150 epochs) computes at dense
shapes with masks re-zeroing the weights every step (post_train.py:
357-360), full-token.  We train the sliced architecture instead
(train/compact_ft.py — provably the same kept-coordinate update
trajectory, tests/test_compact_ft.py) AND under the physical
deterministic token drop (r4: vit.apply patch_physical / compact_ft
token_ratio gather — the serving artifact's exact semantics, which also
shrinks the sequence 198 -> k+2).  Four rows at the bench serving
architecture (half the heads, half the MLP units, all blocks kept),
DeiT-Small:

  masked_dense   mode-0 full-token masked step   (the reference's cost)
  dense_drop     dense layout + physical drop    (train/step.py mode 2)
  compact        sliced, full-token
  compact_drop   sliced + physical drop          (the shipped recipe)

Timing mirrors bench.py: the drivers' own bundled step (k distinct
batches per launch), interleaved best-of-N so relay dispatch drift hits
all rows equally.

Usage: timeout 2400 python scripts/tpu_stage2_compact.py \
           [--out STAGE2C_rN.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(os.environ.get("UVC_COMPILE_CACHE",
                                        "/tmp/uvc_jaxcache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bundle", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--token_ratio", type=float, default=0.7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.configs import get_config
    from uvc_tpu.infer.compact import compact_flops_fraction, compact_model
    from uvc_tpu.models import vit
    from uvc_tpu.train.compact_ft import (build_compact_stage2_step,
                                          compact_train_tree)
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage2_step

    cfg = get_config("deit_small_patch16_224")
    hp0 = MinimaxHParams(enable_patch_gating=0)          # full-token rows
    hp2 = MinimaxHParams(enable_patch_gating=2,          # physical drop
                         patch_ratio=args.token_ratio)
    thp = TrainHParams(num_classes=1000, t_total=10000, warmup_steps=500,
                       compute_dtype=jnp.bfloat16)
    b, k = args.batch, args.bundle

    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    teacher = vit.init_params(jax.random.PRNGKey(1), cfg)
    ln, d, f = cfg.depth, cfg.embed_dim, cfg.mlp_hidden
    attn = np.zeros((ln, d), np.float32)
    attn[:, :d // 2] = 1.0                       # keep 3 of 6 heads
    mlp = np.zeros((ln, f), np.float32)
    mlp[:, :f // 2] = 1.0                        # keep half the MLP units
    masks = {"attn": jnp.asarray(attn), "mlp": jnp.asarray(mlp)}
    block_keep = np.ones(ln, bool)

    xs = jax.random.normal(key, (k, b, cfg.img_size, cfg.img_size, 3),
                           jnp.bfloat16)
    ys = jnp.zeros((k, b), jnp.int32)

    ctree, meta = compact_train_tree(params, masks, cfg,
                                     block_keep=block_keep)
    steps = {
        "masked_dense": (build_stage2_step(cfg, hp0, thp, donate=False,
                                           bundle=k),
                         create_train_state(params, thp, None)),
        "dense_drop": (build_stage2_step(cfg, hp2, thp, donate=False,
                                         bundle=k),
                       create_train_state(jax.tree.map(jnp.copy, params),
                                          thp, None)),
        "compact": (build_compact_stage2_step(cfg, hp0, thp, meta,
                                              donate=False, bundle=k),
                    create_train_state(ctree, thp, None)),
        "compact_drop": (build_compact_stage2_step(cfg, hp2, thp, meta,
                                                   donate=False, bundle=k),
                         create_train_state(jax.tree.map(jnp.copy, ctree),
                                            thp, None)),
    }

    def make_run(step, st):
        def run(kk):
            _, m = step(st, teacher, masks, xs, ys, kk)
            float(jax.device_get(m["loss"].ravel()[-1]))
        return run

    pairs = [(name, make_run(step, st)) for name, (step, st) in
             steps.items()]
    for name, fn in pairs:
        t0 = time.perf_counter()
        fn(key)                                  # compile + warm
        print(f"{name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
    times = {name: [] for name, _ in pairs}
    for i in range(args.rounds):
        for name, fn in pairs:
            sub = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            fn(sub)
            times[name].append(time.perf_counter() - t0)

    out = {name: round(b * k / min(ts), 1) for name, ts in times.items()}
    out["speedup"] = round(out["compact"] / out["masked_dense"], 3)
    out["speedup_drop"] = round(out["compact_drop"] / out["masked_dense"],
                                3)
    out["speedup_dense_drop"] = round(
        out["dense_drop"] / out["masked_dense"], 3)
    layers, _ = compact_model(params, masks, cfg, block_keep=block_keep)
    out["compact_flops_fraction"] = round(
        compact_flops_fraction(layers, cfg), 4)
    out["compact_drop_flops_fraction"] = round(compact_flops_fraction(
        layers, cfg, token_ratio=args.token_ratio), 4)
    out["token_ratio"] = args.token_ratio
    out["batch"] = b
    out["bundle"] = k
    out["model"] = cfg.name
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"harness": "tpu_stage2_compact",
                       "platform": jax.devices()[0].platform,
                       "unit": "img/s", **out}, fh, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
