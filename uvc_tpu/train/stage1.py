"""Stage-1 driver: joint weight + architecture training under a FLOPs budget.

Functional equivalent of the reference ``joint_train.py`` main/train loop
(:249-528, :683-1041), restructured around one jitted SPMD step:

  epoch loop (host):
    - phase select (warmup epochs <= warmup_epochs: frozen gating,
      distrib=(.5,.5), gumbel_hard — joint_train.py:344-360)
    - zlr staircase per epoch (:441-442, :999-1005)
    - eps decay per UVC epoch (:385-386)
    - per-batch: jitted stage-1 step (forward+KD+backward+AdamW+prox+
      minimax updates)
    - epoch end: masks rebuild, sparsity + Expectation/Real FLOPs report
      (:500-509), validation (:498), checkpoint.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import ViTConfig
from uvc_tpu.compress.masks import (build_masks, count_remaining_params,
                                    total_maskable_params)
from uvc_tpu.compress.minimax import init_compression_state
from uvc_tpu.compress.resource import build_macs_table, flops_fraction
from uvc_tpu.compress.scores import group_scores
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.data.pipeline import (device_prefetch,
                                   normalize_on_device)
from uvc_tpu.models import get_model
from uvc_tpu.ops.gumbel import block_gating_distrib
from uvc_tpu.ops.stes import ste_ceil
from uvc_tpu.train.state import TrainHParams, TrainState, create_train_state
from uvc_tpu.train.step import build_eval_step, build_stage1_step
from uvc_tpu.utils.checkpoint import save_checkpoint
from uvc_tpu.utils.logging import AverageMeter, MetricLogger
from uvc_tpu.utils.schedules import get_tau


def expectation_and_real_flops(params, cstate, cfg: ViTConfig,
                               hp: MinimaxHParams, table, key):
    """Epoch-end report (joint_train.py:509): one stochastic ("expectation")
    and one hard-gated ("real") resource evaluation, plus the deterministic
    argmax-gating value ("real_argmax" — the FLOPs of the architecture
    stage 2 would actually extract, ``keep = g1 > g0``; the stochastic
    "real" draw matches the reference's report but coin-flips whole blocks
    when gating logits hover near equality, which is sampling noise, not
    architecture movement)."""
    _, scores2, _ = group_scores(params["blocks"], cfg.num_heads)
    gating = params.get("block_gating")

    if not hp.flops_with_mhsa:
        # the flops2 alternative is deterministic (gating/eps-invariant)
        from uvc_tpu.compress.resource import flops2_fraction
        f = float(flops2_fraction(ste_ceil(cstate.s), ste_ceil(cstate.r),
                                  scores2, cfg))
        return f, f, f

    def frac(distrib):
        return float(flops_fraction(ste_ceil(cstate.s), ste_ceil(cstate.r),
                                    scores2, distrib, table, cfg))

    if hp.enable_block_gating and gating is not None:
        def sample(hard):
            return block_gating_distrib(
                key, gating, use_gumbel=hp.use_gumbel, gumbel_hard=hard,
                eps=cstate.eps, warmup=False)[:, 1]
        argmax_keep = (gating[:, 1] > gating[:, 0]).astype(jnp.float32)
        return frac(sample(False)), frac(sample(True)), frac(argmax_keep)
    return frac(1.0), frac(1.0), frac(1.0)


def run_validation(eval_step, params, masks, loader, logger,
                   step: int, shard_fn=None) -> float:
    correct = 0
    loss_sum = 0.0
    count = 0
    key = jax.random.PRNGKey(0)
    for x, y in loader:
        key, sub = jax.random.split(key)
        if shard_fn is not None:
            x, y = shard_fn((jnp.asarray(x), jnp.asarray(y)))
        xb = normalize_on_device(jnp.asarray(x))
        m = eval_step(params, masks, xb, jnp.asarray(y), sub)
        correct += int(m["correct"])
        loss_sum += float(m["loss_sum"])
        count += int(m["count"])
    acc = correct / max(1, count)
    logger.info(f"Validation @ step {step}: loss "
                f"{loss_sum / max(1, count):.5f} acc {acc * 100:.3f}%")
    logger.log_scalars(step, {"test/accuracy": acc,
                              "test/loss": loss_sum / max(1, count)})
    return acc


@dataclasses.dataclass
class Stage1Result:
    state: TrainState
    masks: Any
    best_acc: float


def run_stage1(cfg: ViTConfig, hp: MinimaxHParams, thp: TrainHParams, *,
               train_loader, test_loader, params=None, teacher_params=None,
               seed: int = 42, output_dir: str = "output",
               name: str = "debug", log_interval: int = 2000,
               eval_each_epoch: bool = True, save_checkpoints: bool = True,
               resume: Optional[str] = None, mesh=None, mp: int = 1,
               use_orbax: bool = False, steps_per_launch: int = 1,
               logger: Optional[MetricLogger] = None,
               profiler=None, init_cstate=None) -> Stage1Result:
    logger = logger or MetricLogger(output_dir, name)
    table = build_macs_table(cfg)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)

    if params is None:
        params = get_model(cfg).init_params(
            k_init, cfg, patch_gating=hp.enable_patch_gating == 1)
    if teacher_params is None:
        # reference defaults the teacher to the same pretrained weights
        # (joint_train.py:949-952)
        teacher_params = params

    # init_cstate: start from a caller-provided compression state (e.g.
    # an already-compressed architecture, for the budget-approached-from-
    # below regime of the published base log — scripts/trajectory_fidelity
    # scenario 2); --resume still takes precedence below.
    cstate = (init_cstate if init_cstate is not None
              else init_compression_state(cfg, hp))
    # copy params into the (donated) train state: the caller keeps ownership
    # of its buffers — they routinely alias teacher_params and outlive stage 1
    state = create_train_state(jax.tree.map(jnp.copy, params), thp, cstate)
    start_epoch = 1
    resumed_step = 0
    if resume:
        # full resume: weights + AdamW moments + every minimax variable +
        # optimizer traces + progress (the reference UVC drivers cannot
        # resume at all — they save only model.state_dict(),
        # joint_train.py:107-119; parity model is the baseline suite's
        # full resume, Baseline_pruning/main.py:400-415)
        import os

        from flax import serialization

        from uvc_tpu.utils.checkpoint import OrbaxManager, load_checkpoint
        if os.path.isdir(resume):
            # an orbax checkpoint directory (written with use_orbax=True):
            # restore the latest step
            ck = OrbaxManager(resume).restore()
        else:
            ck = load_checkpoint(resume)
        state = TrainState(
            step=jnp.asarray(ck["global_step"], jnp.int32),
            params=serialization.from_state_dict(state.params,
                                                 ck["params"]),
            opt_state=serialization.from_state_dict(state.opt_state,
                                                    ck["opt_state"]),
            cstate=serialization.from_state_dict(state.cstate,
                                                 ck["cstate"]))
        start_epoch = int(ck.get("epoch", 0)) + 1
        resumed_step = int(ck.get("global_step", 0))
        key = jax.random.PRNGKey(int(ck.get("key_seed", seed)))
        logger.info(f"Resumed stage-1 from {resume} at epoch {start_epoch}")
    # multi-device SPMD (AFTER resume, so restored arrays get mesh
    # placement): shard/replicate state over the mesh so jit partitions
    # the step (batch on "data", optional Megatron TP on "model"); XLA
    # inserts the gradient psum over ICI
    shard_fn = lambda t: t  # noqa: E731
    # prefetch placement: None = default jnp.asarray device put (so the
    # prefetch buffer actually overlaps the host->device copy on the
    # single-device path); sharded runs place directly onto the mesh
    prefetch_put = None
    if mesh is not None:
        from uvc_tpu.parallel.mesh import (replicate, shard_batch,
                                           shard_params)
        state = state.replace(
            params=shard_params(state.params, mesh, mp=mp),
            opt_state=(replicate(state.opt_state, mesh) if mp == 1
                       else state.opt_state),
            cstate=replicate(state.cstate, mesh),
            grad_accum=(shard_params(state.grad_accum, mesh, mp=mp)
                        if state.grad_accum is not None else None))
        teacher_params = shard_params(
            jax.tree.map(jnp.asarray, teacher_params), mesh, mp=mp)
        shard_fn = lambda t: shard_batch(t, mesh)  # noqa: E731
        prefetch_put = shard_fn
    total_param = float(total_maskable_params(params))
    logger.info(f"** Initial FLOP size: {table.dense_flops / 2e6:.2f}M MACs "
                f"(dense {table.dense_flops / 1e6:.2f}M FLOPs)")

    gas = max(1, thp.accum_steps)
    steps_per_epoch = len(train_loader)
    # optimizer/arch updates (and the tau anneal) tick on accumulation
    # boundaries, not micro-batches (joint_train.py:424-431; the
    # reference's tau quirk of mixing the two counters is not copied)
    t_total = (steps_per_epoch // gas) * thp.num_epochs
    warm_step = build_stage1_step(cfg, table, hp, thp, warmup=True)
    uvc_step = build_stage1_step(cfg, table, hp, thp, warmup=False)
    # step bundling (k steps scanned in ONE program — amortizes the serial
    # per-launch dispatch latency, measured 2-15 ms through relayed TPU
    # attachments): single-device + no-accumulation path only (the mesh
    # path shards batch axis 0; bundled inputs are [k, B, ...])
    spl = max(1, steps_per_launch)
    if spl > 1 and (mesh is not None or gas > 1):
        logger.info("steps_per_launch ignored (mesh or grad-accum active)")
        spl = 1
    if spl > 1:
        warm_bundle = build_stage1_step(cfg, table, hp, thp, warmup=True,
                                        bundle=spl)
        uvc_bundle = build_stage1_step(cfg, table, hp, thp, warmup=False,
                                       bundle=spl)
    if gas > 1:
        warm_micro = build_stage1_step(cfg, table, hp, thp, warmup=True,
                                       micro=True)
        uvc_micro = build_stage1_step(cfg, table, hp, thp, warmup=False,
                                      micro=True)
    eval_step = build_eval_step(cfg, hp, thp, masked=False)

    # orbax: async-capable, multi-host-safe manager keeping the latest few
    # epochs; resume by passing its directory as --resume
    ck_mgr = None
    if save_checkpoints and use_orbax:
        from uvc_tpu.utils.checkpoint import OrbaxManager
        ck_mgr = OrbaxManager(f"{logger.dir}/orbax")

    best_acc = 0.0
    global_step = resumed_step
    losses = AverageMeter()
    # built from the (possibly restored) cstate up front, so resuming from
    # a checkpoint whose epoch >= num_epochs still returns real masks to
    # the inline stage-2 instead of None
    masks = build_masks(state.params, ste_ceil(state.cstate.s),
                        ste_ceil(state.cstate.r), cfg)
    metrics = None

    for epoch in range(start_epoch, thp.num_epochs + 1):
        warmup = epoch <= thp.warmup_epochs
        stage = "Warm Up" if warmup else "UVC Train"
        step_fn = warm_step if warmup else uvc_step
        micro_fn = (warm_micro if warmup else uvc_micro) if gas > 1 else None
        train_loader.set_epoch(epoch)

        # masks rebuild + sparsity report at epoch start
        # (joint_train.py:377-382)
        masks = build_masks(state.params, ste_ceil(state.cstate.s),
                            ste_ceil(state.cstate.r), cfg)
        remained = float(count_remaining_params(state.params, masks, cfg))
        logger.info("=" * 60)
        logger.info(f"Start [Epoch {epoch}] at Stage {stage}")
        logger.info(f"[Initial Sparsity|Epoch {epoch}] Parameter size: "
                    f"{remained / 1e6:.2f}M / {total_param / 1e6:.2f}M = "
                    f"{remained / total_param * 100:.2f}%")

        cstate = state.cstate
        if not warmup:
            # eps decay (joint_train.py:385-386, uvc_utils.py:290-293) and
            # zlr staircase (:441-442)
            cstate = cstate.replace(
                eps=cstate.eps * hp.eps_decay,
                zlr=jnp.asarray(hp.zlr_for_epoch(epoch, thp.num_epochs),
                                jnp.float32))
            state = state.replace(cstate=cstate)

        t0 = time.time()
        buf = []
        for bi, (x, y) in enumerate(
                device_prefetch(iter(train_loader), put=prefetch_put)):
            if profiler is not None:
                profiler.step(global_step)
            if spl > 1:
                # step bundling: collect spl batches, run them as ONE
                # program (lax.scan inside the jitted step); tau is
                # precomputed per sub-step so the anneal stays exact
                tau = get_tau(10.0, 0.1, global_step + len(buf), t_total) \
                    if hp.enable_patch_gating == 2 else jnp.asarray(-1.0)
                buf.append((normalize_on_device(x), jnp.asarray(y),
                            jnp.asarray(tau, jnp.float32)))
                if len(buf) < spl and bi != steps_per_epoch - 1:
                    continue
                adv = len(buf)
                if adv == spl:
                    key, sub = jax.random.split(key)
                    bundle_fn = warm_bundle if warmup else uvc_bundle
                    state, ms = bundle_fn(
                        state, teacher_params,
                        jnp.stack([t[0] for t in buf]),
                        jnp.stack([t[1] for t in buf]),
                        jnp.stack([t[2] for t in buf]), sub)
                    for j in range(adv):
                        gs = global_step + j + 1
                        if gs % 50 == 0:
                            losses.update(float(ms["loss"][j]))
                            logger.log_scalars(gs, {
                                "train/loss": ms["loss"][j],
                                "train/lr": ms["lr"][j],
                                "resource": ms["resource"][j],
                            })
                    global_step += adv
                    metrics = jax.tree.map(lambda a: a[-1], ms)
                else:
                    # epoch-tail remainder: run singly (the k=1 program)
                    for xb2, y2, tau2 in buf:
                        key, sub = jax.random.split(key)
                        state, metrics = step_fn(state, teacher_params,
                                                 xb2, y2, sub, tau2)
                        global_step += 1
                        if global_step % 50 == 0:
                            losses.update(float(metrics["loss"]))
                            logger.log_scalars(global_step, {
                                "train/loss": metrics["loss"],
                                "train/lr": metrics["lr"],
                                "resource": metrics["resource"],
                            })
                buf = []
                if not warmup and (global_step // log_interval
                                   != (global_step - adv) // log_interval):
                    logger.log_series("s", global_step, state.cstate.s)
                    logger.log_series("r", global_step, state.cstate.r)
                    if hp.enable_block_gating:
                        logger.log_series("gating", global_step,
                                          state.params["block_gating"])
                continue
            key, sub = jax.random.split(key)
            tau = get_tau(10.0, 0.1, global_step, t_total) \
                if hp.enable_patch_gating == 2 else jnp.asarray(-1.0)
            xb = normalize_on_device(x)
            if gas > 1 and (bi + 1) % gas != 0:
                # accumulate grads only; a trailing partial window at epoch
                # end carries into the next boundary, as the reference's
                # zero_grad-on-boundary does (joint_train.py:448)
                state, _ = micro_fn(state, teacher_params, xb, y, sub, tau)
                continue
            state, metrics = step_fn(state, teacher_params, xb, y, sub, tau)
            global_step += 1
            if global_step % 50 == 0:
                losses.update(float(metrics["loss"]))
                logger.log_scalars(global_step, {
                    "train/loss": metrics["loss"],
                    "train/lr": metrics["lr"],
                    "resource": metrics["resource"],
                })
            if global_step % log_interval == 0 and not warmup:
                logger.log_series("s", global_step, state.cstate.s)
                logger.log_series("r", global_step, state.cstate.r)
                if hp.enable_block_gating:
                    logger.log_series("gating", global_step,
                                      state.params["block_gating"])
        dt = time.time() - t0
        imgs = steps_per_epoch * train_loader.batch_size
        if losses.count == 0 and metrics is not None:
            losses.update(float(jax.device_get(metrics["loss"])))
        logger.info(f"[Epoch {epoch}] {dt:.1f}s "
                    f"({imgs / max(dt, 1e-9):.1f} img/s) "
                    f"loss {losses.avg:.4f}")
        losses.reset()

        masks = build_masks(state.params, ste_ceil(state.cstate.s),
                            ste_ceil(state.cstate.r), cfg)
        remained = float(count_remaining_params(state.params, masks, cfg))
        key, k_rep = jax.random.split(key)
        exp_f, real_f, argmax_f = expectation_and_real_flops(
            state.params, state.cstate, cfg, hp, table, k_rep)
        logger.info(f"[Validation Sparsity|Step {global_step}|Epoch {epoch}]")
        logger.info(f"Parameter size: {remained / 1e6:.2f}M / "
                    f"{total_param / 1e6:.2f}M = "
                    f"{remained / total_param * 100:.2f}%")
        logger.info(f"Expectation FLOPs: {exp_f * 100:.4f}% "
                    f"Real FLOPs: {real_f * 100:.4f}% "
                    f"(argmax {argmax_f * 100:.4f}%)")
        logger.log_scalars(global_step, {
            "train/param_size": remained / total_param,
            "train/flops_expectation": exp_f,
            "train/flops_real": real_f,
            "train/flops_real_argmax": argmax_f,
            "train/z": float(state.cstate.z),
        })

        if eval_each_epoch and test_loader is not None:
            acc = run_validation(eval_step, state.params, masks, test_loader,
                                 logger, global_step,
                                 shard_fn=(None if mesh is None
                                           else shard_fn))
            best_acc = max(best_acc, acc)

        if save_checkpoints:
            from flax import serialization
            # params stored once; cstate/opt_state carry the full
            # resumable training state (AdamW moments, minimax optimizer
            # traces, gating accumulator)
            tree = {"params": state.params,
                    "cstate": serialization.to_state_dict(state.cstate),
                    "opt_state": serialization.to_state_dict(state.opt_state),
                    "masks": masks, "epoch": epoch, "step": global_step,
                    "global_step": global_step, "key_seed": seed + epoch}
            if ck_mgr is not None:
                ck_mgr.save(epoch, tree)
            else:
                save_checkpoint(f"{logger.dir}/{cfg.name}_{epoch}.ckpt",
                                tree)

    if profiler is not None:
        profiler.close()
    return Stage1Result(state=state, masks=masks, best_acc=best_acc)
