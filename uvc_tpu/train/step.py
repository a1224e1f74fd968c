"""Jitted SPMD train / eval steps for both UVC stages.

One compiled step fuses everything the reference does across many separate
host-driven phases per batch (joint_train.py:395-488):

  mixup -> student forward (gating + token selection) -> teacher forward ->
  KD loss -> backward -> grad clip -> AdamW -> prox -> s/r primal steps ->
  gating interval step -> dual ascent -> projection

Data parallelism: the step is written for jit with sharded batch inputs —
XLA inserts the gradient all-reduce over the ICI mesh automatically (the
reference's apex DDP + NCCL: joint_train.py:292-293).  The architecture
state is replicated; because the whole update is inside the same program,
every device computes bitwise-identical minimax updates (the reference
relies on seed determinism for this — SURVEY.md §2.4).

Stage 2 (post_train.py:270-403): masks enforced every step, gating frozen
to hard decisions, soft distillation fine-tuning.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig
from uvc_tpu.compress.masks import build_masks
from uvc_tpu.compress.minimax import arch_update
from uvc_tpu.compress.resource import MacsTable
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.data.mixup import mixup_cutmix
from uvc_tpu.distill.losses import (distillation_loss,
                                    label_smoothing_cross_entropy,
                                    soft_target_cross_entropy)
from uvc_tpu.models import get_model
from uvc_tpu.ops.gumbel import block_gating_distrib
from uvc_tpu.train.state import (TrainHParams, TrainState, clip_global_norm,
                                 make_weight_optimizer, zero_frozen_updates)


def _base_loss(logits, targets, labels, thp: TrainHParams):
    """SoftTargetCE when mixup is active, else label-smoothing CE
    (joint_train.py:938-944)."""
    if thp.mixup > 0 or thp.cutmix > 0:
        return soft_target_cross_entropy(logits, targets)
    if thp.smoothing > 0:
        return label_smoothing_cross_entropy(logits, labels, thp.smoothing)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _teacher_logits(teacher_params, x, cfg: ViTConfig, dtype):
    """Dense teacher forward in eval mode (losses.py:47-49; the teacher has
    gating disabled and its init [-1,1] logits always keep every block)."""
    model = get_model(cfg)
    out = model.apply(teacher_params, x, cfg, dtype=dtype, train=False)
    return model.eval_logits(out, cfg)


def _bundle_step(step, bundle: int, donate: bool, *, n_static: int,
                 n_batch: int):
    """Wrap a per-batch ``step(state, teacher, *static, *batch, key,
    *tail)`` into one jitted program that scans ``bundle`` batches
    (leading axis k on the batch args), folding the key per sub-step.

    Rationale: every program launch pays host->device dispatch latency
    serially (on relayed/remote TPU attachments this floor was measured at
    2-15 ms depending on service state — larger than a whole DeiT-Small
    step's pure compute share).  Scanning k steps inside one program
    amortizes it k-fold; metrics come back stacked [k]."""

    def bundled(state, teacher_params, *rest):
        static = rest[:n_static]
        batches = rest[n_static:n_static + n_batch]
        key = rest[n_static + n_batch]
        tail = rest[n_static + n_batch + 1:]

        def body(st, inp):
            *batch, i = inp
            st2, m = step(st, teacher_params, *static, *batch,
                          jax.random.fold_in(key, i), *tail)
            return st2, m

        state, ms = jax.lax.scan(
            body, state, (*batches, jnp.arange(bundle)))
        return state, ms

    return jax.jit(bundled, donate_argnums=(0,) if donate else ())


def build_stage1_step(cfg: ViTConfig, table: MacsTable, hp: MinimaxHParams,
                      thp: TrainHParams, *, warmup: bool,
                      donate: bool = True, micro: bool = False,
                      bundle: int = 1):
    """Returns jitted ``step(state, teacher_params, x, labels, key, tau)``.

    ``warmup`` selects the phase (epochs <= warmup_epochs force
    distrib=(.5,.5), freeze gating, gumbel_hard=1: joint_train.py:344-360);
    two compiled variants exist, one per phase.

    During warmup epochs the weight optimizer runs at the constant
    ``warmup_lr`` (joint_train.py:351 pins every param group; note the
    reference's per-step ``scheduler.step()`` immediately overwrites that
    assignment after the first update of each epoch — we implement the
    documented intent, a constant lr for the whole warmup phase, not the
    one-step-per-epoch artifact).

    ``micro=True`` builds the gradient-accumulation micro-step: it only adds
    ``grad(loss)/accum_steps`` into ``state.grad_accum`` (reference
    semantics: loss/N backward with no optimizer step,
    joint_train.py:414-424).  The full step (``micro=False``) then combines
    the buffer with its own batch's grads and applies clip + AdamW + the
    whole arch update, clearing the buffer.
    """
    # constant warmup lr passed as a callable so the optax state structure
    # matches the cosine-phase variant (both are scale_by_schedule)
    lr_fn = (lambda step: jnp.asarray(thp.warmup_lr, jnp.float32)) \
        if warmup else thp.lr_schedule()
    tx = make_weight_optimizer(thp, lr_fn=lr_fn)
    gumbel_hard = warmup  # joint_train.py:347, :359
    dtype = thp.compute_dtype
    accum = thp.accum_steps

    def step(state: TrainState, teacher_params, x, labels, key, tau):
        k_mix, k_gate, k_part1, k_part2, k_tok, k_arch = \
            jax.random.split(key, 6)

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
            gating_distrib = None
            if hp.enable_block_gating:
                gating_distrib = block_gating_distrib(
                    k_gate, params["block_gating"],
                    use_gumbel=hp.use_gumbel, gumbel_hard=gumbel_hard,
                    eps=state.cstate.eps, warmup=warmup)
            attn_d = mlp_d = None
            if hp.enable_part_gating:
                attn_d = block_gating_distrib(
                    k_part1, params["attn_gating"], use_gumbel=True,
                    gumbel_hard=gumbel_hard, eps=state.cstate.eps,
                    warmup=False)
                mlp_d = block_gating_distrib(
                    k_part2, params["mlp_gating"], use_gumbel=True,
                    gumbel_hard=gumbel_hard, eps=state.cstate.eps,
                    warmup=False)
            out = get_model(cfg).apply(
                params, x, cfg,
                gating_distrib=gating_distrib,
                attn_distrib=attn_d, mlp_distrib=mlp_d,
                tau=tau if hp.enable_patch_gating == 2 else -1.0,
                patch_ratio=hp.patch_ratio,
                patch_gate_mode=hp.enable_patch_gating,
                jumping=hp.enable_jumping,
                rng=k_tok, train=True, dtype=dtype)
            base = _base_loss(out.logits, targets, labels, thp)
            t_logits = _teacher_logits(teacher_params, x, cfg, dtype)
            loss = distillation_loss(
                base, out.logits_kd, t_logits,
                kind=thp.distillation_type, alpha=thp.distillation_alpha,
                tau=thp.distillation_tau)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)

        if micro:
            # accumulate loss/N grads only (joint_train.py:414-419); the
            # optimizer/arch update happens on the boundary step
            new_accum = jax.tree.map(lambda a, g: a + g / accum,
                                     state.grad_accum, grads)
            return state.replace(grad_accum=new_accum), {"loss": loss}

        if accum > 1:
            # boundary step: fold the buffered micro-grads in with this
            # batch's contribution, then clear the buffer
            grads = jax.tree.map(lambda a, g: a + g / accum,
                                 state.grad_accum, grads)

        if warmup and "block_gating" in grads:
            # block_skip_gating.requires_grad=False during warmup
            # (joint_train.py:349)
            grads = dict(grads)
            grads["block_gating"] = jnp.zeros_like(grads["block_gating"])

        grads, grad_norm = clip_global_norm(grads, thp.max_grad_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = zero_frozen_updates(updates)
        if warmup:
            # zeroing the grad is not enough: AdamW's decoupled weight decay
            # would still move the frozen gating logits — zero the update
            # (torch skips requires_grad=False params entirely)
            updates = dict(updates)
            updates["block_gating"] = jnp.zeros_like(updates["block_gating"])
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        gating_loss_grad = grads.get("block_gating") \
            if hp.enable_block_gating else None
        params, cstate, arch_metrics = arch_update(
            params, state.cstate, key=k_arch, step=state.step,
            gating_loss_grad=gating_loss_grad,
            main_lr=lr_fn(state.step), hp=hp, cfg=cfg, table=table,
            warmup=warmup, gumbel_hard=gumbel_hard)

        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "lr": lr_fn(state.step), **arch_metrics}
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            cstate=cstate,
            grad_accum=(jax.tree.map(jnp.zeros_like, state.grad_accum)
                        if accum > 1 else state.grad_accum))
        return new_state, metrics

    if bundle > 1:
        assert not micro and thp.accum_steps == 1, (
            "step bundling does not compose with gradient accumulation")

        def step_taulast(st, teacher_params, x, labels, tau, key):
            return step(st, teacher_params, x, labels, key, tau)

        # bundled signature: (state, teacher, xs[k,B,...], labels[k,B],
        # taus[k], key) -> (state, stacked metrics [k]); tau is scanned so
        # the per-step anneal stays exact under bundling
        return _bundle_step(step_taulast, bundle, donate, n_static=0,
                            n_batch=3)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_stage2_step(cfg: ViTConfig, hp: MinimaxHParams, thp: TrainHParams,
                      *, donate: bool = True, micro: bool = False,
                      bundle: int = 1):
    """Mask-frozen distillation fine-tune step (post_train.py:270-403).

    Masks are enforced by activation masking every step (equivalent to the
    reference's per-step ``weight *= mask``: post_train.py:357-360); block
    gating is the frozen hard decision ``keep = g1 > g0`` (the stage-2 model
    runs the ungated branch of the block loop: model_distilled.py:496-500).

    ``micro=True``: gradient-accumulation micro-step (post_train.py:641-649),
    see ``build_stage1_step``.

    Token selection (``hp.enable_patch_gating == 2``): stage 2 fine-tunes
    under the PHYSICAL deterministic top-k token drop (``rng=None`` +
    ``patch_physical`` — the kept tokens are gathered, the sequence axis
    really shrinks).  This deliberately goes beyond the reference — its
    stage-2 model has no token machinery at all (post_train.py:55-58
    builds plain DeiT) — because our serving artifact physically drops
    tokens (infer/compact.py): fine-tuning full-token and serving
    token-dropped was measured to cost 11.4 points on the hardened e2e
    task (r4), and fine-tuning under the *masked* drop (ghost rows still
    attending) another 2.35 points of ghost-row drift at serving (gate
    A7).  Physical fine-tuning makes training exactly the serving
    semantics — and ~30% cheaper at ratio 0.7.  The scorer itself is
    frozen (part of the discovered architecture, like block gating).
    """
    tx = make_weight_optimizer(thp)
    lr_fn = thp.lr_schedule()
    dtype = thp.compute_dtype
    accum = thp.accum_steps

    def step(state: TrainState, teacher_params, masks, x, labels, key):
        k_mix, _ = jax.random.split(key)
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
            g = params["block_gating"]
            keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
            gating_distrib = jnp.stack([1.0 - keep, keep], axis=-1)
            gating_distrib = jax.lax.stop_gradient(gating_distrib)
            out = get_model(cfg).apply(
                params, x, cfg, gating_distrib=gating_distrib, masks=masks,
                patch_gate_mode=(2 if hp.enable_patch_gating == 2 else 0),
                patch_ratio=hp.patch_ratio, patch_physical=True,
                train=True, dtype=dtype)
            base = _base_loss(out.logits, targets, labels, thp)
            t_logits = _teacher_logits(teacher_params, x, cfg, dtype)
            return distillation_loss(
                base, out.logits_kd, t_logits,
                kind=thp.distillation_type, alpha=thp.distillation_alpha,
                tau=thp.distillation_tau)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)

        if micro:
            new_accum = jax.tree.map(lambda a, g: a + g / accum,
                                     state.grad_accum, grads)
            return state.replace(grad_accum=new_accum), {"loss": loss}
        if accum > 1:
            grads = jax.tree.map(lambda a, g: a + g / accum,
                                 state.grad_accum, grads)

        grads = dict(grads)
        # gating frozen (post_train.py:312, 342)
        grads["block_gating"] = jnp.zeros_like(grads["block_gating"])
        grads, grad_norm = clip_global_norm(grads, thp.max_grad_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = zero_frozen_updates(updates)
        # weight decay would otherwise still move the frozen gating logits
        updates = dict(updates)
        updates["block_gating"] = jnp.zeros_like(updates["block_gating"])
        if hp.enable_patch_gating == 2 and "token_scorer" in updates:
            # the scorer is frozen architecture too: its grad through the
            # piecewise-constant top-k mask is exactly zero, but decoupled
            # weight decay would still shrink it
            updates["token_scorer"] = jax.tree.map(
                jnp.zeros_like, updates["token_scorer"])
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "lr": lr_fn(state.step)}
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            grad_accum=(jax.tree.map(jnp.zeros_like, state.grad_accum)
                        if accum > 1 else state.grad_accum))
        return new_state, metrics

    if bundle > 1:
        assert not micro and thp.accum_steps == 1, (
            "step bundling does not compose with gradient accumulation")
        # bundled signature: (state, teacher, masks, xs[k,B,...],
        # labels[k,B], key) -> (state, stacked metrics [k])
        return _bundle_step(step, bundle, donate, n_static=1, n_batch=2)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_eval_step(cfg: ViTConfig, hp: MinimaxHParams,
                    thp: TrainHParams, *, masked: bool):
    """Validation step (joint_train.py valid :199-246): hard-gated forward,
    top-1 correct count + summed CE loss, optionally with masks applied.

    Token selection at eval is the DETERMINISTIC noise-free top-k applied
    PHYSICALLY (gather, not mask) — exactly the serving decision rule and
    semantics (infer/compact.py apply_compact).  The reference's valid()
    samples Gumbel noise at tau=1 instead (joint_train.py:216-227); on the
    hardened r4 e2e task that noisy eval overstated serving accuracy by
    11.4 points (noise-averaged selection masked a train/serve mismatch),
    and the masked deterministic drop overstated it by another 2.35 points
    (ghost rows still absorbing attention), so we diverge deliberately:
    validation must measure the artifact that ships.  ``key`` is kept in
    the signature for API stability but no longer feeds the token draw."""
    dtype = thp.compute_dtype

    def step(params, masks, x, labels, key):
        gating_distrib = None
        if hp.enable_block_gating:
            g = params["block_gating"]
            keep = (g[:, 1] > g[:, 0]).astype(jnp.float32)
            gating_distrib = jnp.stack([1.0 - keep, keep], axis=-1)
        tau = 1.0 if hp.enable_patch_gating == 2 else -1.0
        model = get_model(cfg)
        out = model.apply(params, x, cfg,
                          gating_distrib=gating_distrib,
                          masks=masks if masked else None,
                          tau=tau, patch_ratio=hp.patch_ratio,
                          patch_gate_mode=hp.enable_patch_gating,
                          patch_hard=True, patch_physical=True,
                          rng=None, train=False, dtype=dtype)
        logits = model.eval_logits(out, cfg)
        # label -1 marks padding rows from the full-coverage eval sharding
        # (data/pipeline.py); they are masked out of every reduction
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        correct = (jnp.argmax(logits, axis=-1) == labels) & valid
        return {"correct": jnp.sum(correct),
                "loss_sum": jnp.sum(jnp.where(valid, nll, 0.0)),
                "count": jnp.sum(valid.astype(jnp.int32))}

    return jax.jit(step)
