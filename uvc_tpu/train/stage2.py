"""Stage-2 driver: mask-frozen distillation fine-tuning.

Functional equivalent of the reference ``post_train.py`` (:270-403, :406-688):
loads a stage-1 checkpoint (params + masks + frozen gating), linearly scales
the learning rate by global batch / 512 (:297-302), and fine-tunes with soft
distillation while the architecture stays fixed.  Mask enforcement is
structural (activation masking in the forward) rather than the reference's
per-step ``weight *= mask`` (:357-360) — functionally identical, zero
overhead.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.data.pipeline import (device_prefetch,
                                   normalize_on_device)
from uvc_tpu.train.state import TrainHParams, create_train_state
from uvc_tpu.train.stage1 import run_validation
from uvc_tpu.train.step import build_eval_step, build_stage2_step
from uvc_tpu.utils.checkpoint import save_checkpoint
from uvc_tpu.utils.logging import AverageMeter, MetricLogger


@dataclasses.dataclass
class Stage2Result:
    state: Any
    best_acc: float


def run_stage2(cfg: ViTConfig, hp: MinimaxHParams, thp: TrainHParams, *,
               params, masks, teacher_params=None, train_loader,
               test_loader, seed: int = 42, output_dir: str = "output",
               name: str = "post", eval_every: int = 1000,
               world_batch: Optional[int] = None,
               save_checkpoints: bool = True, mesh=None, mp: int = 1,
               steps_per_launch: int = 1, resume: Optional[str] = None,
               use_orbax: bool = False, compact: bool = False,
               logger: Optional[MetricLogger] = None,
               profiler=None) -> Stage2Result:
    """``compact=True`` fine-tunes the PHYSICALLY COMPACTED model
    (train/compact_ft.py): dropped blocks removed, pruned heads sliced
    out, kept MLP units lane-padded — exactly the masked-dense update
    trajectory on the kept coordinates at genuinely reduced FLOPs (the
    reference computes the whole 150-epoch stage-2 at dense shapes:
    post_train.py:357-360).  Checkpoints and eval stay dense-layout via
    scatter_to_dense, so compact runs interoperate with every dense
    checkpoint consumer; resuming a compact run re-compacts the restored
    dense params (the saved opt_state is compact-shaped — resume compact
    runs with compact=True).  Tensor-parallel (mp > 1) shardings are not
    plumbed for the per-layer compact tree; DP meshes work (replicated
    params)."""
    logger = logger or MetricLogger(output_dir, name)
    if teacher_params is None:
        teacher_params = params

    # linear lr scaling: lr * global_batch / 512 (post_train.py:297-302)
    if world_batch is None:
        world_batch = train_loader.batch_size * jax.process_count()
    thp = dataclasses.replace(
        thp, learning_rate=thp.learning_rate * world_batch / 512.0)

    cmeta = None
    if compact:
        from uvc_tpu.train.compact_ft import (compact_train_tree,
                                              scatter_to_dense)
        if mesh is not None and mp > 1:
            raise ValueError("compact stage-2 supports data-parallel "
                             "meshes only (mp == 1)")
        dense_template = jax.tree.map(jnp.copy, params)
        ctree, cmeta = compact_train_tree(params, masks, cfg)
        to_dense = lambda p: jax.tree.map(  # noqa: E731
            jnp.asarray, scatter_to_dense(p, cmeta, dense_template, masks))
        state = create_train_state(ctree, thp, None)
        logger.info(
            f"[compact] training {len(ctree['layers'])} of "
            f"{len(cmeta.block_keep)} blocks at sliced shapes")
    else:
        to_dense = lambda p: p  # noqa: E731
        # copy params into the (donated) train state: callers keep their
        # buffers
        state = create_train_state(jax.tree.map(jnp.copy, params), thp,
                                   None)
    start_epoch = 0
    resumed_step = 0
    resumed_best = 0.0
    key = jax.random.PRNGKey(seed)
    if resume:
        # full mid-run resume: weights + AdamW moments + progress + best
        # accuracy.  The reference's UVC stage-2 cannot resume (it saves
        # only best params: post_train.py:395-400); the parity model is
        # the baseline suite's full resume (Baseline_pruning/
        # main.py:400-415) — the 150-epoch stage-2 fine-tune is the
        # longest job in the recipe and must restart-survive.
        import os

        from flax import serialization

        from uvc_tpu.utils.checkpoint import OrbaxManager, load_checkpoint
        if os.path.isdir(resume):
            ck = OrbaxManager(resume).restore()
        else:
            ck = load_checkpoint(resume)
        if compact:
            # checkpoints are dense-layout — re-slice the restored params;
            # the opt_state was saved compact-shaped by this mode
            from uvc_tpu.train.compact_ft import compact_train_tree
            restored, _ = compact_train_tree(
                serialization.from_state_dict(
                    jax.tree.map(jnp.asarray, dense_template),
                    ck["params"]),
                masks, cfg)
        else:
            restored = serialization.from_state_dict(state.params,
                                                     ck["params"])
        state = state.replace(
            step=jnp.asarray(ck["global_step"], jnp.int32),
            params=restored,
            opt_state=serialization.from_state_dict(state.opt_state,
                                                    ck["opt_state"]))
        start_epoch = int(ck.get("epoch", -1)) + 1
        resumed_step = int(ck.get("global_step", 0))
        resumed_best = float(ck.get("best_acc", 0.0))
        key = jax.random.PRNGKey(int(ck.get("key_seed", seed)))
        logger.info(f"Resumed stage-2 from {resume} at epoch {start_epoch} "
                    f"(step {resumed_step}, best {resumed_best:.4f})")
    shard_fn = lambda t: t  # noqa: E731
    prefetch_put = None  # default device put when unsharded
    if mesh is not None:
        from uvc_tpu.parallel.mesh import (replicate, shard_batch,
                                           shard_params)
        state = state.replace(
            params=shard_params(state.params, mesh, mp=mp),
            opt_state=(replicate(state.opt_state, mesh) if mp == 1
                       else state.opt_state),
            grad_accum=(shard_params(state.grad_accum, mesh, mp=mp)
                        if state.grad_accum is not None else None))
        teacher_params = shard_params(
            jax.tree.map(jnp.asarray, teacher_params), mesh, mp=mp)
        masks = replicate(masks, mesh)
        shard_fn = lambda t: shard_batch(t, mesh)  # noqa: E731
        prefetch_put = shard_fn
    gas = max(1, thp.accum_steps)
    if compact:
        from uvc_tpu.train.compact_ft import build_compact_stage2_step
        _build = functools.partial(build_compact_stage2_step,
                                   cfg, hp, thp, cmeta)
    else:
        _build = functools.partial(build_stage2_step, cfg, hp, thp)
    step_fn = _build()
    micro_fn = _build(micro=True) if gas > 1 else None
    # step bundling (see stage1.py): single-device, no-accum path only
    spl = max(1, steps_per_launch)
    if spl > 1 and (mesh is not None or gas > 1):
        logger.info("steps_per_launch ignored (mesh or grad-accum active)")
        spl = 1
    bundle_fn = _build(bundle=spl) if spl > 1 else None
    steps_per_epoch = len(train_loader)
    eval_step = build_eval_step(cfg, hp, thp, masked=True)

    # orbax manager for resumable per-epoch checkpoints (pass its
    # directory as resume=)
    ck_mgr = None
    if save_checkpoints and use_orbax:
        from uvc_tpu.utils.checkpoint import OrbaxManager
        ck_mgr = OrbaxManager(f"{logger.dir}/orbax")

    best_acc = resumed_best
    global_step = resumed_step
    losses = AverageMeter()
    metrics = None

    logger.info("***** [Stage 2] Post Training *****")
    for epoch in range(start_epoch, thp.num_epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        buf = []
        for bi, (x, y) in enumerate(
                device_prefetch(iter(train_loader), put=prefetch_put)):
            if profiler is not None:
                profiler.step(global_step)
            if spl > 1:
                buf.append((normalize_on_device(x), jnp.asarray(y)))
                if len(buf) < spl and bi != steps_per_epoch - 1:
                    continue
                adv = len(buf)
                if adv == spl:
                    key, sub = jax.random.split(key)
                    state, ms = bundle_fn(
                        state, teacher_params, masks,
                        jnp.stack([t[0] for t in buf]),
                        jnp.stack([t[1] for t in buf]), sub)
                    for j in range(adv):
                        gs = global_step + j + 1
                        if gs % 50 == 0:
                            losses.update(float(ms["loss"][j]))
                            logger.log_scalars(gs, {
                                "train/loss": ms["loss"][j],
                                "train/lr": ms["lr"][j]})
                    global_step += adv
                    metrics = jax.tree.map(lambda a: a[-1], ms)
                else:
                    for xb2, y2 in buf:
                        key, sub = jax.random.split(key)
                        state, metrics = step_fn(state, teacher_params,
                                                 masks, xb2, y2, sub)
                        global_step += 1
                        if global_step % 50 == 0:
                            losses.update(float(metrics["loss"]))
                            logger.log_scalars(global_step, {
                                "train/loss": metrics["loss"],
                                "train/lr": metrics["lr"]})
                buf = []
                if (eval_every and test_loader is not None
                        and global_step // eval_every
                        != (global_step - adv) // eval_every):
                    acc = run_validation(eval_step, to_dense(state.params), masks,
                                         test_loader, logger, global_step,
                                         shard_fn=(None if mesh is None
                                                   else shard_fn))
                    if acc > best_acc:
                        best_acc = acc
                        if save_checkpoints:
                            save_checkpoint(
                                f"{logger.dir}/{cfg.name}_best.ckpt",
                                {"params": to_dense(state.params), "masks": masks,
                                 "step": global_step, "acc": acc})
                continue
            key, sub = jax.random.split(key)
            xb = normalize_on_device(x)
            if gas > 1 and (bi + 1) % gas != 0:
                state, _ = micro_fn(state, teacher_params, masks, xb, y, sub)
                continue
            state, metrics = step_fn(state, teacher_params, masks, xb,
                                     y, sub)
            global_step += 1
            if global_step % 50 == 0:
                losses.update(float(metrics["loss"]))
                logger.log_scalars(global_step, {
                    "train/loss": metrics["loss"],
                    "train/lr": metrics["lr"]})
            if (eval_every and global_step % eval_every == 0
                    and test_loader is not None):
                acc = run_validation(eval_step, to_dense(state.params), masks,
                                     test_loader, logger, global_step,
                                     shard_fn=(None if mesh is None
                                               else shard_fn))
                if acc > best_acc:
                    best_acc = acc
                    if save_checkpoints:
                        save_checkpoint(
                            f"{logger.dir}/{cfg.name}_best.ckpt",
                            {"params": to_dense(state.params), "masks": masks,
                             "step": global_step, "acc": acc})
        dt = time.time() - t0
        if losses.count == 0 and metrics is not None:
            losses.update(float(jax.device_get(metrics["loss"])))
        logger.info(f"[Stage2 Epoch {epoch}] {dt:.1f}s loss {losses.avg:.4f}")
        losses.reset()

        if save_checkpoints:
            from flax import serialization

            # resumable per-epoch state, symmetric with stage 1
            tree = {"params": to_dense(state.params),
                    "compact": compact,
                    "opt_state": serialization.to_state_dict(
                        state.opt_state),
                    "masks": masks, "epoch": epoch,
                    "global_step": global_step, "best_acc": best_acc,
                    "key_seed": seed + 10_000 + epoch}
            if ck_mgr is not None:
                ck_mgr.save(epoch, tree)
            else:
                save_checkpoint(
                    f"{logger.dir}/{cfg.name}_post_{epoch}.ckpt", tree)

    if test_loader is not None:
        acc = run_validation(eval_step, to_dense(state.params), masks, test_loader,
                             logger, global_step,
                             shard_fn=(None if mesh is None
                                       else shard_fn))
        best_acc = max(best_acc, acc)
    if profiler is not None:
        profiler.close()
    return Stage2Result(state=state, best_acc=best_acc)
