"""Export a physically compacted serving model from a UVC checkpoint.

  python -m uvc_tpu.cli.export_compact --model_type deit_small_patch16_224 \\
      --checkpoint out/run/deit_small_patch16_224_30.ckpt \\
      --save_file compact.ckpt

Slices pruned heads / MLP units and drops skipped blocks (see
uvc_tpu/infer/compact.py); logits are bitwise-identical to the masked
dense model at ~2x inference throughput for a 50%-FLOPs architecture.
Beyond reference parity: the reference serves the masked dense model at
full dense cost.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import get_config


def main(argv=None):
    p = argparse.ArgumentParser("uvc_tpu compact export")
    p.add_argument("--model_type", default="deit_small_patch16_224")
    p.add_argument("--checkpoint", required=True,
                   help="stage-1/2 .ckpt with params (+ masks)")
    p.add_argument("--save_file", required=True)
    p.add_argument("--img_size", default=224, type=int)
    p.add_argument("--num_classes", default=1000, type=int)
    p.add_argument("--token_ratio", default=None, type=float,
                   help="physically drop tokens at serving: keep the "
                        "scorer's top int(ratio*N) patches per image "
                        "(use the discovered --patch_ratio); default "
                        "keeps the full sequence")
    p.add_argument("--export_stablehlo", default=None,
                   help="also write an AOT StableHLO serving artifact "
                        "(.npz) callable with jax alone — see "
                        "uvc_tpu/infer/export.py")
    p.add_argument("--serve_batches", default="8",
                   help="comma-separated batch sizes to export")
    args = p.parse_args(argv)

    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.infer.compact import compact_flops_fraction, compact_model
    from uvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = get_config(args.model_type).replace(
        img_size=args.img_size, num_classes=args.num_classes)
    ck = load_checkpoint(args.checkpoint)
    params = ck["params"] if "params" in ck else ck
    if ck.get("masks"):
        masks = {"attn": jnp.asarray(ck["masks"]["attn"]),
                 "mlp": jnp.asarray(ck["masks"]["mlp"])}
    else:
        cs = ck["cstate"]
        masks = build_masks(params, jnp.ceil(jnp.asarray(cs["s"])),
                            jnp.ceil(jnp.asarray(cs["r"])), cfg)

    layers, top = compact_model(params, masks, cfg)
    frac = compact_flops_fraction(layers, cfg, token_ratio=args.token_ratio)
    print(f"compact model: {len(layers)} blocks kept, "
          f"{frac * 100:.2f}% of dense FLOPs")
    save_checkpoint(args.save_file, {
        "layers": layers, "top": top, "model_type": args.model_type,
        "img_size": args.img_size, "num_classes": args.num_classes,
        "token_ratio": (-1.0 if args.token_ratio is None
                        else float(args.token_ratio)),
        "flops_fraction": float(frac)})
    print(f"saved to {args.save_file}")

    if args.export_stablehlo:
        from uvc_tpu.infer.export import export_serving, save_serving
        batches = [int(s) for s in args.serve_batches.split(",") if s]
        arts = export_serving(
            layers, top, cfg, batch_sizes=batches,
            token_ratio=args.token_ratio)
        save_serving(args.export_stablehlo, arts)
        print(f"StableHLO serving artifact (batches {batches}) "
              f"saved to {args.export_stablehlo}")


if __name__ == "__main__":
    main()
