"""Gradient-sparsity analysis CLI
(reference: Baseline_pruning/show_gradient_sparsity.py — see
uvc_tpu/diagnostics.py for why this is a fresh implementation).

  python -m uvc_tpu.cli.show_gradient_sparsity --model_type \\
      deit_tiny_patch16_224 --dataset synthetic --num_batches 4
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from uvc_tpu.cli import flags
from uvc_tpu.configs import get_config


def main(argv=None):
    p = argparse.ArgumentParser("uvc_tpu gradient sparsity")
    flags.add_common_flags(p)
    p.add_argument("--num_batches", default=4, type=int)
    p.add_argument("--threshold", default=0.0, type=float)
    p.add_argument("--top", default=20, type=int)
    args = flags.parse_with_config(p, argv)

    from uvc_tpu.cli.joint_train import build_loaders, load_params
    from uvc_tpu.data.pipeline import normalize_on_device
    from uvc_tpu.diagnostics import format_report, gradient_sparsity_stats
    from uvc_tpu.models import get_model

    num_classes = flags.num_classes_for(args.dataset)
    if args.img_size is None:
        args.img_size = get_config(args.model_type).img_size
    cfg = get_config(args.model_type).replace(
        img_size=args.img_size, num_classes=num_classes)
    params = load_params(args, cfg)
    train, _ = build_loaders(args, num_classes, args.img_size)

    def loss_fn(p, x, y):
        out = get_model(cfg).apply(p, x, cfg, train=True, dtype=jnp.bfloat16)
        logp = jax.nn.log_softmax(out.logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    grad_fn = jax.jit(jax.grad(loss_fn))
    acc = None
    for i, (x, y) in enumerate(train):
        if i >= args.num_batches:
            break
        g = grad_fn(params, normalize_on_device(jnp.asarray(x)),
                    jnp.asarray(y))
        acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
    stats = gradient_sparsity_stats(acc, threshold=args.threshold)
    print(format_report(stats, args.top))


if __name__ == "__main__":
    main()
