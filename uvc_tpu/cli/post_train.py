"""Stage-2 CLI: mask-frozen distillation fine-tune
(reference: UVC/post_train.py main :406-688).

Loads a stage-1 checkpoint (uvc_tpu .ckpt with params+masks, or a torch
stage-1 .pth.tar whose mask buffers ride along in the state_dict) and
fine-tunes with soft distillation.

  python -m uvc_tpu.cli.post_train --model_type deit_small_patch16_224 \
      --checkpoint_dir output/uvc_train/debug/deit_small_patch16_224_30.ckpt \
      --dataset imagenet --data_dir /data/imagenet --num_epochs 100
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from uvc_tpu.cli import flags
from uvc_tpu.cli.joint_train import build_loaders, load_params
from uvc_tpu.configs import get_config


def main(argv=None):
    parser = argparse.ArgumentParser("uvc_tpu stage-2 post training")
    flags.add_common_flags(parser)
    flags.add_uvc_flags(parser)
    flags.add_stage2_flags(parser)
    parser.add_argument("--checkpoint_dir", required=True,
                        help="stage-1 checkpoint to fine-tune")
    args = flags.parse_with_config(parser, argv)

    from uvc_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(args.coordinator, args.num_processes,
                         args.process_id)

    num_classes = flags.num_classes_for(args.dataset)
    if args.img_size is None:
        args.img_size = get_config(args.model_type).img_size
    cfg = get_config(args.model_type).replace(
        img_size=args.img_size, num_classes=num_classes,
        distilled=bool(args.enable_deit))
    hp = flags.to_hparams(args)

    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.utils.checkpoint import load_checkpoint
    if args.checkpoint_dir.endswith(".ckpt"):
        ck = load_checkpoint(args.checkpoint_dir)
        params = ck["params"]
        if "masks" in ck and ck["masks"] is not None:
            masks = {k: jnp.asarray(v) for k, v in ck["masks"].items()}
        else:
            cs = ck.get("cstate", {})
            masks = build_masks(params, jnp.asarray(cs["s"]),
                                jnp.asarray(cs["r"]), cfg)
    else:
        from uvc_tpu.models.convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.checkpoint_dir, cfg)
        # masks implicit in zeroed weights; rebuild dense (all-keep) masks
        l = cfg.depth
        masks = {"attn": jnp.ones((l, cfg.embed_dim)),
                 "mlp": jnp.ones((l, cfg.mlp_hidden))}

    train_loader, test_loader = build_loaders(args, num_classes,
                                              args.img_size)
    thp = flags.to_train_hparams(args, len(train_loader), num_classes)

    teacher_path = args.teacher_path or args.model_path
    if args.distillation_type != "none" and teacher_path:
        t_args = argparse.Namespace(**vars(args))
        t_args.model_path = teacher_path
        teacher = load_params(t_args, cfg)
    else:
        teacher = params

    mesh = None
    # --dp 1 --mp 1 forces single-device (smoke tests); default engages
    # the full mesh whenever more than one device is visible
    if (args.dp == 1 and args.mp == 1):
        pass
    elif len(jax.devices()) > 1 or args.mp > 1:
        from uvc_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, mp=args.mp)
        print(f"Mesh: {dict(mesh.shape)}")

    from uvc_tpu.train.stage2 import run_stage2
    from uvc_tpu.utils import profiler as prof
    run_stage2(cfg, hp, thp, params=params, masks=masks,
               teacher_params=teacher, train_loader=train_loader,
               test_loader=test_loader, seed=args.seed,
               output_dir=args.output_dir, name=args.name,
               eval_every=args.eval_every, mesh=mesh, mp=args.mp,
               world_batch=args.train_batch_size,
               steps_per_launch=args.steps_per_launch,
               resume=args.resume, use_orbax=bool(args.use_orbax),
               compact=bool(args.compact_train),
               profiler=prof.from_args(args))


if __name__ == "__main__":
    main()
