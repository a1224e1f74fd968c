"""Offline mask-generation CLI (reference:
Baseline_pruning/generating_mask.py).

  python -m uvc_tpu.cli.generate_mask --type synflow --model_type \\
      deit_tiny_patch16_224 --sparsity 0.5 --save_file mask.ckpt

Types (generating_mask.py:86-389):
  synflow — 100-round exponential schedule on an all-ones input (no data)
  mag     — magnitude, global threshold
  taylor  — |grad * w| over one pass of training data
  sp      — structured per-head / per-MLP-channel masks from one batch's
            gradients (saved as both structural and elementwise masks)
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from uvc_tpu.cli import flags
from uvc_tpu.configs import get_config


def main(argv=None):
    p = argparse.ArgumentParser("uvc_tpu mask generation")
    p.add_argument("--type", required=True,
                   choices=["synflow", "mag", "taylor", "sp"])
    p.add_argument("--sparsity", default=0.5, type=float,
                   help="density to KEEP (reference naming quirk: "
                        "generating_mask.py:62 'density')")
    p.add_argument("--atten_density", default=0.5, type=float)
    p.add_argument("--mlp_density", default=0.5, type=float)
    p.add_argument("--scope", default="global", choices=["global", "local"])
    p.add_argument("--model_type", default="deit_tiny_patch16_224")
    p.add_argument("--pretrained", default=None, type=str,
                   help="checkpoint to score (.ckpt or torch .pth); "
                        "default: random init")
    p.add_argument("--save_file", required=True)
    p.add_argument("--data_dir", default="/data/imagenet")
    p.add_argument("--dataset", default="synthetic",
                   choices=["imagenet", "cifar10", "cifar100", "synthetic"])
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--num_batches", default=1, type=int,
                   help="scoring batches for taylor/sp")
    p.add_argument("--input_size", default=None, type=int,
                   help="default: the model config's native size")
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args(argv)

    from uvc_tpu.baselines import pruning
    from uvc_tpu.models import get_model
    from uvc_tpu.utils.checkpoint import save_checkpoint

    num_classes = flags.num_classes_for(args.dataset)
    if args.input_size is None:
        args.input_size = get_config(args.model_type).img_size
    cfg = get_config(args.model_type).replace(
        img_size=args.input_size, num_classes=num_classes)

    if args.pretrained:
        if args.pretrained.endswith(".ckpt"):
            from uvc_tpu.utils.checkpoint import load_checkpoint
            ck = load_checkpoint(args.pretrained)
            params = ck["params"] if "params" in ck else ck
            # score with the checkpoint's own class count: a dataset
            # whose labels overflow the loaded head would turn every
            # taylor/sp gradient into a NaN (OOB take_along_axis) and
            # silently emit all-zero masks
            import numpy as np
            head_classes = int(np.asarray(params["head"]["kernel"]).shape[-1])
            if head_classes != cfg.num_classes:
                print(f"warning: checkpoint head has {head_classes} classes, "
                      f"dataset implies {cfg.num_classes}; scoring with "
                      f"{head_classes} (scoring batches are filtered to "
                      f"labels the loaded head can express)")
                cfg = cfg.replace(num_classes=head_classes)
        else:
            from uvc_tpu.models.convert import load_torch_checkpoint
            params = load_torch_checkpoint(args.pretrained, cfg)
    else:
        params = get_model(cfg).init_params(jax.random.PRNGKey(args.seed), cfg)

    def batches():
        from uvc_tpu.cli.joint_train import build_loaders
        ns = argparse.Namespace(
            dataset=args.dataset, data_dir=args.data_dir,
            train_batch_size=args.batch_size,
            eval_batch_size=args.batch_size, seed=args.seed,
            synthetic_steps=args.num_batches, num_workers=8,
            img_size=args.input_size)
        train, _ = build_loaders(ns, num_classes, args.input_size)
        from uvc_tpu.data.pipeline import normalize_on_device
        import numpy as np
        out = []
        for i, (x, y) in enumerate(train):
            if i >= args.num_batches:
                break
            x, y = np.asarray(x), np.asarray(y)
            # a checkpoint head narrower than the dataset can only
            # express labels < head width: drop the rest instead of
            # aliasing them (mod-reduction skews gradient importance)
            keep = y < cfg.num_classes
            if not keep.all():
                x, y = x[keep], y[keep]
            if y.size == 0:
                continue
            out.append((normalize_on_device(jnp.asarray(x)),
                        jnp.asarray(y)))
        if not out:
            raise SystemExit(
                f"no scoring samples have labels < the checkpoint head "
                f"width ({cfg.num_classes}); use a checkpoint matching "
                f"the dataset or score with --type mag/synflow")
        return out

    if args.type == "mag":
        scores = pruning.magnitude_scores(params)
        masks = (pruning.global_threshold_mask(scores, args.sparsity)
                 if args.scope == "global"
                 else pruning.local_threshold_mask(scores, args.sparsity))
    elif args.type == "synflow":

        def forward_sum(p):
            ones = jnp.ones((1, cfg.img_size, cfg.img_size, cfg.in_chans))
            out = get_model(cfg).apply(p, ones, cfg, train=False)
            return jnp.sum(out.logits) + (
                jnp.sum(out.logits_kd) if cfg.distilled else 0.0)

        _, masks = pruning.synflow_scores(params, forward_sum,
                                          args.sparsity, epochs=100)
    elif args.type == "taylor":

        def loss_fn(p, x, y):
            out = get_model(cfg).apply(p, x, cfg, train=True)
            logp = jax.nn.log_softmax(out.logits, axis=-1)
            # batches() guarantees y < head width (mismatched labels
            # are filtered out, never aliased)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

        scores = pruning.taylor_scores(params, loss_fn, batches())
        masks = (pruning.global_threshold_mask(scores, args.sparsity)
                 if args.scope == "global"
                 else pruning.local_threshold_mask(scores, args.sparsity))
    else:  # sp

        def loss_fn(p, x, y):
            out = get_model(cfg).apply(p, x, cfg, train=True)
            logp = jax.nn.log_softmax(out.logits, axis=-1)
            # batches() guarantees y < head width (mismatched labels
            # are filtered out, never aliased)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

        x, y = batches()[0]
        grads = jax.grad(loss_fn)(params, x, y)
        structural = pruning.sp_structured_masks(
            params, grads, cfg, args.atten_density, args.mlp_density)
        masks = pruning.head_masks_to_weight_masks(
            structural["attn"], structural["mlp"], params, cfg)
        save_checkpoint(args.save_file + ".structural",
                        {"attn": structural["attn"],
                         "mlp": structural["mlp"]})

    remain = pruning.mask_sparsity(masks)
    print(f"* remain weight = {remain * 100:.4f} %")
    save_checkpoint(args.save_file, pruning.masks_to_flat(masks, params))
    print(f"saved mask to {args.save_file}")


if __name__ == "__main__":
    main()
