"""Stage-2 fine-tuning at physically compacted shapes.

The reference's stage-2 fine-tune computes at DENSE shapes for the whole
150-epoch job — masks re-zero the weights every step (post_train.py:
357-360) but every matmul runs full size.  This module trains the
*sliced* architecture instead: dropped blocks are removed (stage-2's
gating is the frozen hard decision ``g1 > g0``, train/step.py
build_stage2_step), pruned heads' q/k/v/proj columns are gathered out,
and kept MLP units are lane-padded — the same plan serving compaction
uses (infer/compact.py layer_plans).

The update trajectory on the kept coordinates is EXACTLY the masked-dense
trajectory (tests/test_compact_ft.py), because

  * masked coordinates receive exactly-zero gradients in the dense step
    (activation masking kills both sides of each product), so dropping
    them changes neither the loss gradient nor the global grad-norm used
    for clipping;
  * the within-head v-mask multiplies *activations* here (not folded
    into proj rows as serving does) so kept-head q/k columns keep their
    dense gradients while v/proj sides stay frozen, matching the
    reference's r-pruning semantics (uvc_utils.py:376-401);
  * the MLP lane-padding slots start at zero weight with zero gradient
    and zero AdamW moments, so their updates are identically zero — no
    re-masking step is ever needed;
  * AdamW's decoupled weight decay is uniform over all leaves
    (train/state.py make_weight_optimizer), so the kept coordinates see
    the same decay in both trees.

Checkpoints and eval stay DENSE-layout: ``scatter_to_dense`` writes the
compact tree back into the stage-1 parameter layout, so stage-2 compact
runs interoperate with every existing checkpoint consumer (eval steps,
serving export, resume) — the weight gathers happen at runtime, the same
principle the T2T stem kernels follow.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.configs import ViTConfig
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.models import vit
from uvc_tpu.models.vit import ForwardOutput, _layer_norm
from uvc_tpu.ops.gumbel import (gather_tokens_with_pos,
                                physical_topk_indices, token_scores)
from uvc_tpu.train.state import (TrainHParams, TrainState, clip_global_norm,
                                 make_weight_optimizer, zero_frozen_updates)


class CompactMeta(NamedTuple):
    """Static (non-differentiated) plan for a compact training tree."""
    plans: tuple          # per-kept-layer dicts from infer.compact.layer_plans
    block_keep: tuple     # [L] bool, the frozen stage-2 gating decision
    dims: tuple           # (num_heads, head_size, embed_dim, mlp_hidden)


_TOP_KEYS = ("patch_embed", "cls_token", "pos_embed", "norm", "head",
             "dist_token", "head_dist", "resnet", "t2t", "token_scorer",
             "patch_gating")


def compact_train_tree(params: dict, masks: Dict[str, jax.Array],
                       cfg: ViTConfig, *,
                       block_keep: Optional[np.ndarray] = None,
                       lane_align: int = 128):
    """Build the trainable compact pytree + its static meta.

    Unlike serving's ``compact_model``, the within-head v-mask is NOT
    folded into proj rows — it is applied to activations in the forward so
    the masked rows keep exactly-zero gradients (matching the dense step)
    instead of being retrained.
    """
    from uvc_tpu.infer.compact import layer_plans

    blocks = jax.tree.map(np.asarray, params["blocks"])
    d = int(np.asarray(masks["attn"]).shape[1])
    if block_keep is None:
        g = np.asarray(params["block_gating"])
        block_keep = g[:, 1] > g[:, 0]
    plans = layer_plans(masks, cfg, block_keep=np.asarray(block_keep),
                        lane_align=lane_align)

    layers: List[dict] = []
    for plan in plans:
        i = plan["layer_id"]
        sel3, cols = plan["sel3"], plan["cols"]
        kept_units, fk = plan["kept_units"], plan["fk"]
        fc1 = np.zeros((d, fk), blocks["fc1"]["kernel"].dtype)
        fc1_b = np.zeros((fk,), blocks["fc1"]["bias"].dtype)
        fc2 = np.zeros((fk, d), blocks["fc2"]["kernel"].dtype)
        if len(kept_units):
            fc1[:, :len(kept_units)] = \
                blocks["fc1"]["kernel"][i][:, kept_units]
            fc1_b[:len(kept_units)] = blocks["fc1"]["bias"][i][kept_units]
            fc2[:len(kept_units), :] = \
                blocks["fc2"]["kernel"][i][kept_units, :]
        layers.append({
            "ln1": {"scale": jnp.asarray(blocks["ln1"]["scale"][i]),
                    "bias": jnp.asarray(blocks["ln1"]["bias"][i])},
            "qkv": {"kernel": jnp.asarray(
                        blocks["qkv"]["kernel"][i][:, sel3]),
                    "bias": jnp.asarray(blocks["qkv"]["bias"][i][sel3])},
            "proj": {"kernel": jnp.asarray(
                        blocks["proj"]["kernel"][i][cols, :]),
                     "bias": jnp.asarray(blocks["proj"]["bias"][i])},
            "ln2": {"scale": jnp.asarray(blocks["ln2"]["scale"][i]),
                    "bias": jnp.asarray(blocks["ln2"]["bias"][i])},
            "fc1": {"kernel": jnp.asarray(fc1), "bias": jnp.asarray(fc1_b)},
            "fc2": {"kernel": jnp.asarray(fc2),
                    "bias": jnp.asarray(blocks["fc2"]["bias"][i])},
        })

    top = {k: jax.tree.map(jnp.asarray, params[k]) for k in _TOP_KEYS
           if k in params}
    meta = CompactMeta(
        plans=tuple({**p, "cols": tuple(int(c) for c in p["cols"]),
                     "sel3": tuple(int(c) for c in p["sel3"]),
                     "vmask": tuple(float(v) for v in p["vmask"]),
                     "kept_units": tuple(int(u) for u in p["kept_units"])}
                    for p in plans),
        block_keep=tuple(bool(b) for b in np.asarray(block_keep)),
        dims=(cfg.num_heads, cfg.head_size, cfg.embed_dim, cfg.mlp_hidden))
    return {"layers": layers, "top": top}, meta


def apply_compact_ft(ctree: dict, meta: CompactMeta, x: jax.Array,
                     cfg: ViTConfig, *, dtype=jnp.bfloat16,
                     remat: bool = True,
                     token_ratio: Optional[float] = None) -> ForwardOutput:
    """Differentiable forward of the compact stage-2 model.

    Mirrors the dense stage-2 semantics exactly (vit.apply with hard
    gating + masks, model_distilled.py:429-531): LN in f32, bf16 matmuls,
    f32 softmax, exact GELU, f32 heads.  Uses the XLA-composed sublayers
    (ops/attention.py reference_attention) because the fused Pallas
    backward kernels assume the dense square widths; the compact shapes
    are rectangular per layer, so the program is an unrolled per-layer
    loop compiled once.

    ``token_ratio``: deterministic top-k PHYSICAL token drop (gather —
    identical decision rule and semantics as vit.apply mode 2 with
    rng=None + patch_physical, and as serving's apply_compact) so compact
    fine-tuning trains under exactly the served token budget and
    attention pattern.  The kept-coordinate trajectory parity with the
    dense stage-2 step (tests/test_compact_ft.py) is preserved because
    the dense step gathers by the same frozen-scorer rule.
    """
    top = ctree["top"]
    eps = cfg.layer_norm_eps
    hs = cfg.head_size
    scale = cfg.qk_scale if cfg.qk_scale is not None else hs ** -0.5
    b = x.shape[0]

    if cfg.tokens_type != "none":
        # T2T family: dense tokens-to-token stem (trainable; the frozen
        # performer prm_w updates are zeroed by zero_frozen_updates) +
        # fixed sinusoid positions, as in infer/compact.apply_compact
        from uvc_tpu.models.t2t_vit import sinusoid_pos_embed, t2t_stem
        t = t2t_stem(top, x, cfg, dtype)
        cls = jnp.broadcast_to(top["cls_token"],
                               (b, 1, cfg.embed_dim)).astype(dtype)
        t = jnp.concatenate([cls, t], axis=1)
        t = t + jnp.asarray(sinusoid_pos_embed(
            cfg.num_patches + 1, cfg.embed_dim)).astype(dtype)
    else:
        t = vit.patch_embed(top, x, cfg, dtype)
        idx = None
        if token_ratio is not None and token_ratio < 1.0 \
                and "token_scorer" in top:
            # shared serving-exact drop helpers (ops/gumbel.py) — the
            # SAME code path vit.apply and infer/compact.py run
            k = int(token_ratio * cfg.num_patches)
            idx = physical_topk_indices(
                token_scores(t, top["token_scorer"]), k)
        tokens = [jnp.broadcast_to(top["cls_token"], (b, 1, cfg.embed_dim)
                                   ).astype(dtype)]
        if cfg.distilled:
            tokens.append(jnp.broadcast_to(
                top["dist_token"], (b, 1, cfg.embed_dim)).astype(dtype))
        if idx is not None:
            t = gather_tokens_with_pos(t, idx, tokens, top["pos_embed"],
                                       dtype)
        else:
            t = jnp.concatenate(tokens + [t], axis=1)
            t = t + top["pos_embed"].astype(dtype)

    from jax.ad_checkpoint import checkpoint_name

    from uvc_tpu.ops.attention import layer_attention_ln
    from uvc_tpu.ops.mlp import mlp_ln

    def layer_fwd(z, blk, vmask, ones_fk, hk):
        # the same LN-fused sublayer Pallas programs the dense step uses:
        # the forward kernels take rectangular widths (serving already
        # runs them compacted), and their custom VJPs route rectangular
        # backwards to the composed fallback that keeps the softmax/
        # dq/dk/dv work in the combined kernel (ops/attention.py
        # _fused_layer_bwd; ops/mlp.py is width-generic both ways).
        # ``vmask`` rides the kernels' structural ctx-mask input: an
        # activation multiply, so the masked v/proj coordinates keep
        # exactly-zero grads (see module doc).
        z = layer_attention_ln(
            z, blk["ln1"]["scale"], blk["ln1"]["bias"],
            blk["qkv"]["kernel"].astype(dtype),
            blk["qkv"]["bias"].astype(dtype),
            blk["proj"]["kernel"].astype(dtype),
            blk["proj"]["bias"].astype(dtype), vmask,
            num_heads=hk, scale=scale, eps=eps)
        # saved by the remat policy: the backward replay DCEs the fused
        # attention forward (its VJP residual is the layer input) and the
        # fused MLP forward (its residual is this named sum)
        z = checkpoint_name(z, "attn_out")
        return mlp_ln(
            z, blk["ln2"]["scale"], blk["ln2"]["bias"],
            blk["fc1"]["kernel"].astype(dtype),
            blk["fc1"]["bias"].astype(dtype),
            blk["fc2"]["kernel"].astype(dtype),
            blk["fc2"]["bias"].astype(dtype), ones_fk, eps=eps)

    policy = jax.checkpoint_policies.save_only_these_names("attn_out")
    for blk, plan in zip(ctree["layers"], meta.plans):
        vmask = jnp.asarray(plan["vmask"], dtype)
        ones_fk = jnp.ones((plan["fk"],), dtype)
        fwd = jax.checkpoint(layer_fwd, policy=policy,
                             static_argnums=(4,)) if remat else layer_fwd
        t = fwd(t, blk, vmask, ones_fk, plan["hk"])

    t = _layer_norm(t, top["norm"]["scale"], top["norm"]["bias"], eps)
    cls = t[:, 0].astype(jnp.float32)
    logits = cls @ top["head"]["kernel"] + top["head"]["bias"]
    if cfg.distilled and "head_dist" in top:
        dist = t[:, 1].astype(jnp.float32)
        logits_kd = dist @ top["head_dist"]["kernel"] \
            + top["head_dist"]["bias"]
    else:
        logits_kd = logits
    return ForwardOutput(logits=logits, logits_kd=logits_kd,
                         token_mask=None)


def scatter_to_dense(ctree: dict, meta: CompactMeta, dense_template: dict,
                     masks: Dict[str, jax.Array]) -> dict:
    """Write the compact tree back into the dense stage-1 layout.

    Kept coordinates take the trained compact values; masked/padded
    coordinates and dropped blocks keep the template's values (they are
    multiplicatively dead in every downstream consumer — eval applies the
    masks, serving re-slices).  Returns a NEW dense pytree (numpy leaves);
    the template is not mutated.
    """
    dense = jax.tree.map(lambda a: np.array(a), dense_template)
    blocks = dense["blocks"]
    for blk, plan in zip(ctree["layers"], meta.plans):
        i = plan["layer_id"]
        sel3 = np.asarray(plan["sel3"])
        cols = np.asarray(plan["cols"])
        kept_units = np.asarray(plan["kept_units"], np.int64)
        blocks["ln1"]["scale"][i] = np.asarray(blk["ln1"]["scale"])
        blocks["ln1"]["bias"][i] = np.asarray(blk["ln1"]["bias"])
        blocks["ln2"]["scale"][i] = np.asarray(blk["ln2"]["scale"])
        blocks["ln2"]["bias"][i] = np.asarray(blk["ln2"]["bias"])
        blocks["qkv"]["kernel"][i][:, sel3] = np.asarray(
            blk["qkv"]["kernel"])
        blocks["qkv"]["bias"][i][sel3] = np.asarray(blk["qkv"]["bias"])
        blocks["proj"]["kernel"][i][cols, :] = np.asarray(
            blk["proj"]["kernel"])
        blocks["proj"]["bias"][i] = np.asarray(blk["proj"]["bias"])
        if len(kept_units):
            blocks["fc1"]["kernel"][i][:, kept_units] = np.asarray(
                blk["fc1"]["kernel"])[:, :len(kept_units)]
            blocks["fc1"]["bias"][i][kept_units] = np.asarray(
                blk["fc1"]["bias"])[:len(kept_units)]
            blocks["fc2"]["kernel"][i][kept_units, :] = np.asarray(
                blk["fc2"]["kernel"])[:len(kept_units), :]
        blocks["fc2"]["bias"][i] = np.asarray(blk["fc2"]["bias"])
    for k in _TOP_KEYS:
        if k in ctree["top"]:
            dense[k] = jax.tree.map(np.array, ctree["top"][k])
    return dense


def build_compact_stage2_step(cfg: ViTConfig, hp: MinimaxHParams,
                              thp: TrainHParams, meta: CompactMeta, *,
                              donate: bool = True, micro: bool = False,
                              bundle: int = 1):
    """Compact-shape counterpart of ``build_stage2_step`` — identical
    signature ``step(state, teacher_params, masks, x, labels, key)`` so the
    stage-2 driver can swap it in (the ``masks`` argument is accepted and
    unused: mask enforcement is structural here)."""
    from uvc_tpu.data.mixup import mixup_cutmix
    from uvc_tpu.distill.losses import distillation_loss
    from uvc_tpu.train.step import (_base_loss, _bundle_step,
                                    _teacher_logits)

    tx = make_weight_optimizer(thp)
    lr_fn = thp.lr_schedule()
    dtype = thp.compute_dtype
    accum = thp.accum_steps

    def step(state: TrainState, teacher_params, masks, x, labels, key):
        del masks
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

        def loss_fn(ctree):
            out = apply_compact_ft(
                ctree, meta, x, cfg, dtype=dtype,
                token_ratio=(hp.patch_ratio
                             if hp.enable_patch_gating == 2 else None))
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

        grads, grad_norm = clip_global_norm(grads, thp.max_grad_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = zero_frozen_updates(updates)
        if (hp.enable_patch_gating == 2
                and "token_scorer" in updates.get("top", {})):
            # frozen architecture, as in the dense stage-2 step: zero grad
            # through the piecewise-constant mask, but weight decay would
            # still drift the scorer
            updates = dict(updates)
            updates["top"] = dict(updates["top"])
            updates["top"]["token_scorer"] = jax.tree.map(
                jnp.zeros_like, updates["top"]["token_scorer"])
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
        return _bundle_step(step, bundle, donate, n_static=1, n_batch=2)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def compact_param_count(ctree: dict) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(ctree))
