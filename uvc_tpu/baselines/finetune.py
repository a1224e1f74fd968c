"""Baseline pruning trainer: masked finetuning, GMP, and token selection.

Functional equivalent of ``Baseline_pruning/main.py`` + ``engine.py``:
one-shot-mask finetuning (main.py:275-298: swap in masked layers, load a
precomputed mask, finetune) and gradual magnitude pruning
(engine.py:88-141), with model EMA (main.py:320-326) and full resume of
model+optimizer+EMA+epoch (main.py:400-415).

TPU-native shape: the elementwise weight masks are an explicit pytree
multiplied into the parameters *inside* the jitted step (XLA fuses the
multiply into the consuming matmul — zero-cost, numerically identical to
the reference's masked-layer forward, layers.py:18-24).  Because the loss
is computed through ``w * mask``, gradients arrive pre-masked by the chain
rule, so pruned weights never receive updates (beyond weight decay, which
the mask re-application each step cancels — matching the reference, where
masked weights decay but are re-zeroed by the forward mask).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Iterable, Optional

import flax.struct
import jax
import jax.numpy as jnp

from uvc_tpu.baselines.gmp import GMPSchedule
from uvc_tpu.baselines.pruning import apply_weight_masks, mask_sparsity
from uvc_tpu.configs import ViTConfig
from uvc_tpu.data.mixup import mixup_cutmix
from uvc_tpu.data.pipeline import (device_prefetch,
                                   normalize_on_device)
from uvc_tpu.distill.losses import (distillation_loss,
                                    label_smoothing_cross_entropy,
                                    soft_target_cross_entropy)
from uvc_tpu.models import get_model
from uvc_tpu.train.state import (TrainHParams, clip_global_norm,
                                 make_weight_optimizer,
                                 zero_frozen_updates)
from uvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from uvc_tpu.utils.logging import AverageMeter, MetricLogger
from uvc_tpu.utils.schedules import get_tau


class BaselineState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_baseline_state(params, thp: TrainHParams,
                          ema_decay: float = 0.0) -> BaselineState:
    tx = make_weight_optimizer(thp)
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return BaselineState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx.init(params), ema_params=ema)


def build_baseline_step(cfg: ViTConfig, thp: TrainHParams, *,
                        token_selection: bool = False,
                        token_number: float = 0.7,
                        ema_decay: float = 0.0,
                        drop_path_rate: float = 0.0,
                        re_prob: float = 0.0, re_count: int = 1,
                        re_mode: str = "pixel",
                        donate: bool = True):
    """Jitted ``step(state, teacher_params, wmasks, x, labels, key, tau)``.

    ``teacher_params=None`` disables distillation (plain CE path,
    main.py:338-346); ``wmasks=None`` trains dense.

    DeiT recipe pieces that live on device: random erasing (timm
    RandomErasing mode='pixel', reprob 0.25 in the reference recipe,
    Baseline_pruning/main.py:69-74) runs on the normalized batch *before*
    mixup (timm transform order), and stochastic depth ``drop_path_rate``
    (main.py:56, :261-262) is threaded into the backbone.
    """
    tx = make_weight_optimizer(thp)
    lr_fn = thp.lr_schedule()
    dtype = thp.compute_dtype
    use_distill = thp.distillation_type not in (None, "none")

    def step(state: BaselineState, teacher_params, wmasks, x, labels, key,
             tau):
        k_mix, k_tok, k_re = jax.random.split(key, 3)
        if re_prob > 0:
            from uvc_tpu.data.augment import random_erasing
            x = random_erasing(k_re, x, prob=re_prob, count=re_count,
                               mode=re_mode)
        if thp.mixup > 0 or thp.cutmix > 0:
            x, targets = mixup_cutmix(
                k_mix, x, labels, num_classes=thp.num_classes,
                mixup_alpha=thp.mixup, cutmix_alpha=thp.cutmix,
                prob=thp.mixup_prob, switch_prob=thp.mixup_switch_prob,
                smoothing=thp.smoothing, mode=thp.mixup_mode,
                cutmix_minmax=thp.cutmix_minmax)
        else:
            targets = jax.nn.one_hot(labels, thp.num_classes)

        def loss_fn(params):
            p = apply_weight_masks(params, wmasks) \
                if wmasks is not None else params
            out = get_model(cfg).apply(
                p, x, cfg,
                tau=tau if token_selection else -1.0,
                patch_ratio=token_number,
                patch_gate_mode=2 if token_selection else 0,
                drop_path_rate=drop_path_rate,
                rng=k_tok, train=True, dtype=dtype)
            if thp.mixup > 0 or thp.cutmix > 0:
                base = soft_target_cross_entropy(out.logits, targets)
            elif thp.smoothing > 0:
                base = label_smoothing_cross_entropy(out.logits, labels,
                                                     thp.smoothing)
            else:
                logp = jax.nn.log_softmax(out.logits, axis=-1)
                base = -jnp.mean(jnp.take_along_axis(
                    logp, labels[:, None], axis=-1))
            if use_distill and teacher_params is not None:
                t_out = get_model(cfg).apply(teacher_params, x, cfg, train=False,
                                  dtype=dtype)
                t_logits = get_model(cfg).eval_logits(t_out, cfg)
                return distillation_loss(
                    base, out.logits_kd, t_logits,
                    kind=thp.distillation_type,
                    alpha=thp.distillation_alpha, tau=thp.distillation_tau)
            return base

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads, grad_norm = clip_global_norm(grads, thp.max_grad_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # frozen leaves (performer prm_w) must not receive weight decay
        updates = zero_frozen_updates(updates)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        ema = state.ema_params
        if ema is not None:
            # timm ModelEma semantics (main.py:320-326)
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema, params)
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "lr": lr_fn(state.step)}
        return BaselineState(step=state.step + 1, params=params,
                             opt_state=opt_state, ema_params=ema), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_baseline_eval_step(cfg: ViTConfig, thp: TrainHParams):
    dtype = thp.compute_dtype

    def step(params, wmasks, x, labels):
        p = apply_weight_masks(params, wmasks) \
            if wmasks is not None else params
        model = get_model(cfg)
        out = model.apply(p, x, cfg, train=False, dtype=dtype)
        logits = model.eval_logits(out, cfg)
        # label -1 = padding from the full-coverage eval sharding
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = jnp.where(
            valid,
            -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0], 0.0)
        correct = (jnp.argmax(logits, axis=-1) == labels) & valid
        return {"correct": jnp.sum(correct), "loss_sum": jnp.sum(nll),
                "count": jnp.sum(valid.astype(jnp.int32))}

    return jax.jit(step)


@dataclasses.dataclass
class BaselineResult:
    state: BaselineState
    masks: Any
    best_acc: float


def run_baseline(cfg: ViTConfig, thp: TrainHParams, *, train_loader,
                 test_loader, params, wmasks=None, teacher_params=None,
                 gmp: Optional[GMPSchedule] = None,
                 token_selection: bool = False, token_number: float = 0.7,
                 ema_decay: float = 0.0, drop_path_rate: float = 0.0,
                 re_prob: float = 0.0, re_count: int = 1,
                 re_mode: str = "pixel", seed: int = 0,
                 output_dir: str = "output", name: str = "baseline",
                 resume: Optional[str] = None, start_epoch: int = 0,
                 save_checkpoints: bool = True, mesh=None, mp: int = 1,
                 logger: Optional[MetricLogger] = None) -> BaselineResult:
    """The main.py train loop: epochs of (masked/GMP) training + eval,
    best-checkpoint tracking, full resume."""
    logger = logger or MetricLogger(output_dir, name)
    state = create_baseline_state(jax.tree.map(jnp.copy, params), thp,
                                  ema_decay)
    if teacher_params is not None:
        teacher_params = jax.tree.map(jnp.copy, teacher_params)
    global_step = 0
    best_acc = 0.0

    if resume:
        from flax import serialization

        from uvc_tpu.baselines.pruning import masks_from_flat
        ck = load_checkpoint(resume)
        ema = ck.get("ema_params") or None
        # msgpack restores plain dicts; from_state_dict rebuilds them into
        # the optax NamedTuple template (plain tree.map raises)
        restored = serialization.from_state_dict(state.params, ck["params"])
        if ema is not None:
            ema = (serialization.from_state_dict(state.ema_params, ema)
                   if state.ema_params is not None
                   else jax.tree.map(jnp.asarray, ema))
        elif state.ema_params is not None:
            # --model_ema on but the checkpoint carries no EMA: warm-start
            # from the restored weights, not the stale pre-resume init
            ema = jax.tree.map(jnp.copy, restored)
        state = BaselineState(
            step=jnp.asarray(ck["step"]),
            params=restored,
            opt_state=serialization.from_state_dict(state.opt_state,
                                                    ck["opt_state"]),
            ema_params=ema)
        if ck.get("masks"):
            wmasks = masks_from_flat(ck["masks"], state.params)
        start_epoch = int(ck.get("epoch", 0)) + 1
        global_step = int(ck["step"])
        best_acc = float(ck.get("best_acc", 0.0))
        if gmp is not None:
            gmp.events = int(ck.get("gmp_events", 0))
        logger.info(f"Resumed from {resume} at epoch {start_epoch}")

    shard_fn = lambda t: t  # noqa: E731
    prefetch_put = None  # default device put when unsharded
    if mesh is not None:
        from uvc_tpu.parallel.mesh import (replicate, shard_batch,
                                           shard_params)
        state = BaselineState(
            step=state.step,
            params=shard_params(state.params, mesh, mp=mp),
            opt_state=(replicate(state.opt_state, mesh) if mp == 1
                       else state.opt_state),
            ema_params=(shard_params(state.ema_params, mesh, mp=mp)
                        if state.ema_params is not None else None))
        if teacher_params is not None:
            teacher_params = shard_params(teacher_params, mesh, mp=mp)
        if wmasks is not None:
            wmasks = replicate(wmasks, mesh)
        shard_fn = lambda t: shard_batch(t, mesh)  # noqa: E731
        prefetch_put = shard_fn

    step_fn = build_baseline_step(cfg, thp, token_selection=token_selection,
                                  token_number=token_number,
                                  ema_decay=ema_decay,
                                  drop_path_rate=drop_path_rate,
                                  re_prob=re_prob, re_count=re_count,
                                  re_mode=re_mode)
    eval_fn = build_baseline_eval_step(cfg, thp)
    t_total = len(train_loader) * thp.num_epochs
    metrics = None

    for epoch in range(start_epoch, thp.num_epochs):
        train_loader.set_epoch(epoch)
        losses = AverageMeter()
        t0 = time.time()
        for x, y in device_prefetch(iter(train_loader), put=prefetch_put):
            tau = get_tau(10.0, 0.1, global_step, t_total) \
                if token_selection else jnp.asarray(-1.0)
            key = jax.random.fold_in(jax.random.PRNGKey(seed), global_step)
            xb = normalize_on_device(x)
            state, metrics = step_fn(state, teacher_params, wmasks, xb,
                                     y, key, tau)
            global_step += 1
            if gmp is not None:
                new_masks = gmp.maybe_prune(global_step, state.params)
                if new_masks is not None:
                    wmasks = new_masks
                    logger.info(
                        f"[GMP] step {global_step}: pruning event "
                        f"{gmp.events}, remaining "
                        f"{mask_sparsity(wmasks) * 100:.2f}%")
            if global_step % 50 == 0:
                losses.update(float(metrics["loss"]))
        dt = time.time() - t0
        if losses.count == 0 and metrics is not None:
            losses.update(float(jax.device_get(metrics["loss"])))
        logger.info(f"[Baseline Epoch {epoch}] {dt:.1f}s "
                    f"loss {losses.avg:.4f}")

        if test_loader is not None:
            correct = loss_sum = count = 0
            for x, y in test_loader:
                x, y = shard_fn((jnp.asarray(x), jnp.asarray(y))) \
                    if mesh is not None else (jnp.asarray(x),
                                              jnp.asarray(y))
                xb = normalize_on_device(x)
                m = eval_fn(state.params, wmasks, xb, jnp.asarray(y))
                correct += int(m["correct"])
                loss_sum += float(m["loss_sum"])
                count += int(m["count"])
            acc = correct / max(count, 1)
            logger.info(f"[Baseline Eval|Epoch {epoch}] acc {acc*100:.3f}% "
                        f"loss {loss_sum / max(count, 1):.5f}")
            best_acc = max(best_acc, acc)

        if save_checkpoints:
            from uvc_tpu.baselines.pruning import masks_to_flat
            save_checkpoint(
                f"{logger.dir}/{cfg.name}_baseline_{epoch}.ckpt",
                {"params": state.params, "opt_state": state.opt_state,
                 "ema_params": state.ema_params or {},
                 "masks": (masks_to_flat(wmasks, state.params)
                           if wmasks is not None else {}),
                 "step": int(state.step), "epoch": epoch,
                 "best_acc": best_acc,
                 "gmp_events": gmp.events if gmp is not None else 0})

    return BaselineResult(state=state, masks=wmasks, best_acc=best_acc)
