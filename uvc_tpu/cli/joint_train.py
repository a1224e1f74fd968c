"""Stage-1 CLI: joint UVC training (reference: UVC/joint_train.py main).

Usage (flags match the reference surface; see cli/flags.py):

  python -m uvc_tpu.cli.joint_train --model_type deit_small_patch16_224 \
      --dataset imagenet --data_dir /data/imagenet --budget 0.5 \
      --num_epochs 30 --warmup_epochs 5 --train_batch_size 512

After stage 1 completes it runs the stage-2 fine-tune inline, exactly like
the reference main (joint_train.py:1032-1033).
"""

from __future__ import annotations

import argparse
import os

import jax

from uvc_tpu.cli import flags
from uvc_tpu.configs import get_config


def build_loaders(args, num_classes: int, img_size: int):
    from uvc_tpu.data.pipeline import (ArrayLoader, FolderLoader,
                                       ProceduralLoader, SyntheticLoader,
                                       cifar_arrays)
    pid, pcount = jax.process_index(), jax.process_count()
    per_host_train = args.train_batch_size // pcount
    if args.dataset == "procedural":
        train = ProceduralLoader(per_host_train,
                                 num_batches=args.synthetic_steps,
                                 img_size=img_size,
                                 num_classes=num_classes, train=True,
                                 seed=args.seed, pid=pid, pcount=pcount)
        test = ProceduralLoader(args.eval_batch_size, num_batches=8,
                                img_size=img_size, num_classes=num_classes,
                                train=False, seed=args.seed)
        return train, test
    if args.dataset == "synthetic":
        train = SyntheticLoader(per_host_train,
                                num_batches=args.synthetic_steps,
                                img_size=img_size, num_classes=num_classes,
                                seed=args.seed)
        test = SyntheticLoader(args.eval_batch_size, num_batches=4,
                               img_size=img_size, num_classes=num_classes,
                               seed=args.seed + 1)
        return train, test
    if args.dataset in ("cifar10", "cifar100"):
        xtr, ytr = cifar_arrays(args.data_dir, args.dataset, train=True)
        xte, yte = cifar_arrays(args.data_dir, args.dataset, train=False)
        train = ArrayLoader(xtr, ytr, per_host_train, train=True,
                            img_size=img_size, seed=args.seed, pid=pid,
                            pcount=pcount)
        test = ArrayLoader(xte, yte, args.eval_batch_size, train=False,
                           img_size=img_size, pid=pid, pcount=pcount)
        return train, test
    train = FolderLoader(os.path.join(args.data_dir, "train"),
                         per_host_train, train=True, img_size=img_size,
                         seed=args.seed, num_workers=args.num_workers,
                         pid=pid, pcount=pcount)
    test = FolderLoader(os.path.join(args.data_dir, "val"),
                        args.eval_batch_size, train=False,
                        img_size=img_size, num_workers=args.num_workers,
                        pid=pid, pcount=pcount)
    return train, test


def load_params(args, cfg, key=None):
    from uvc_tpu.models import get_model
    from uvc_tpu.models.convert import load_torch_checkpoint
    from uvc_tpu.utils.checkpoint import load_checkpoint
    key = key if key is not None else jax.random.PRNGKey(args.seed)
    if args.pretrained and args.model_path:
        if args.model_path.endswith(".ckpt"):
            ck = load_checkpoint(args.model_path)
            return ck["params"] if "params" in ck else ck
        if args.model_path.endswith(".npz"):
            from uvc_tpu.models.convert import load_npz_checkpoint
            return load_npz_checkpoint(args.model_path, cfg)
        return load_torch_checkpoint(args.model_path, cfg)
    return get_model(cfg).init_params(
        key, cfg,
        patch_gating=getattr(args, "enable_patch_gating", 0) == 1)


def main(argv=None):
    parser = argparse.ArgumentParser("uvc_tpu stage-1 joint training")
    flags.add_common_flags(parser)
    flags.add_uvc_flags(parser)
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

    train_loader, test_loader = build_loaders(args, num_classes,
                                              args.img_size)
    hp = flags.to_hparams(args)
    thp = flags.to_train_hparams(args, len(train_loader), num_classes)

    params = load_params(args, cfg)
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

    from uvc_tpu.train.stage1 import run_stage1
    from uvc_tpu.utils.logging import MetricLogger
    logger = MetricLogger(args.output_dir, args.name,
                          enable_tensorboard=bool(args.enable_writer))
    logger.info(f"Training parameters {args}")
    from uvc_tpu.utils import profiler as prof
    profiler = prof.from_args(args, logger)
    result = run_stage1(cfg, hp, thp, train_loader=train_loader,
                        test_loader=test_loader, params=params,
                        teacher_params=teacher, seed=args.seed,
                        output_dir=args.output_dir, name=args.name,
                        log_interval=args.log_interval,
                        resume=args.resume, mesh=mesh, mp=args.mp,
                        use_orbax=bool(args.use_orbax),
                        steps_per_launch=args.steps_per_launch,
                        logger=logger, profiler=profiler)

    # inline stage-2 (reference: joint_train.py:1032-1033)
    from uvc_tpu.train.stage2 import run_stage2
    thp2 = flags.to_train_hparams(args, len(train_loader), num_classes,
                                  stage2=True)
    run_stage2(cfg, hp, thp2, params=result.state.params, masks=result.masks,
               teacher_params=teacher, train_loader=train_loader,
               test_loader=test_loader, seed=args.seed,
               output_dir=args.output_dir, name=args.name + "_post",
               eval_every=args.eval_every, mesh=mesh, mp=args.mp,
               world_batch=args.train_batch_size,
               steps_per_launch=args.steps_per_launch, logger=logger)


if __name__ == "__main__":
    main()
