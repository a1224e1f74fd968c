"""The minimax / ADMM architecture-update step.

Pure-functional, fully-jitted equivalent of the reference per-step update
(``uvc_optimizer``, UVC/uvc_optimizer.py:37-144, and the gating-only variant
:148-161), fused with the proximal weight shrinkage that the reference runs
first (prox_w, called at :42).  One call performs:

  1. prox on weights (shrink bottom groups by the dual-weighted factor);
  2. primal gradients for s and r:  grad(loss1) + z * grad(resource), with
     the resource excess clipped to +-z_grad_clip *before* differentiation
     (torch clamp kills gradients outside the window and passes the FULL
     gradient on the boundary — mirrored by ops/stes.torch_clamp, NOT
     jnp.clip, whose min/max grads split 50/50 at exact ties);
  3. block-gating gradient accumulation and the every-``gating_interval``
     SGD-momentum step (reference :89-98 — note the reference weights each
     accumulated grad by ``step % interval`` before averaging; mirrored);
  4. boundary-aware grad clamps, inf-norm clip to 1, optimizer steps, and
     box clamps for s and r (:100-123);
  5. dual ascent on (y, p, z) followed by projection onto >= 0 (:126-135).

During warmup only the prox runs and the resource is reported (:52-58).
With pruning disabled only the dual-z ascent runs (:148-161).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from uvc_tpu.configs import ViTConfig
from uvc_tpu.compress import optim
from uvc_tpu.compress.masks import prox_weights
from uvc_tpu.compress.resource import (MacsTable, flops2_fraction,
                                       flops_fraction)
from uvc_tpu.compress.scores import group_scores
from uvc_tpu.compress.state import CompressionState, MinimaxHParams, OptState
from uvc_tpu.ops.gumbel import block_gating_distrib
from uvc_tpu.ops.stes import least_k_sum, ste_ceil, torch_clamp


def init_compression_state(cfg: ViTConfig, hp: MinimaxHParams
                           ) -> CompressionState:
    l, h = cfg.depth, cfg.num_heads
    f32 = jnp.float32
    s = jnp.zeros((l, 2), f32)
    r = jnp.zeros((l, h), f32)
    return CompressionState(
        s=s,
        r=r,
        y=jnp.full((l, 2), hp.y_init, f32),
        p=jnp.full((l, h), hp.p_init, f32),
        z=jnp.asarray(hp.z_init, f32),
        eps=jnp.asarray(hp.eps, f32),
        zlr=jnp.asarray(float(hp.zlr_schedule[0]), f32),
        gating_accum=jnp.zeros((l, 2), f32),
        s_opt=optim.init_opt_state(hp.soptim, s),
        r_opt=optim.init_opt_state(hp.roptim, r),
        gating_opt=optim.init_opt_state("sgd", jnp.zeros((l, 2), f32)),
    )


def s_r_upper_bounds(cfg: ViTConfig) -> Tuple[jax.Array, jax.Array]:
    """s_ub = [H, d_ff] per layer, r_ub = head_size
    (reference: uvc_utils.py:162-167)."""
    s_ub = jnp.broadcast_to(
        jnp.array([cfg.num_heads, cfg.mlp_hidden], jnp.float32),
        (cfg.depth, 2))
    r_ub = jnp.full((cfg.depth, cfg.num_heads), cfg.head_size, jnp.float32)
    return s_ub, r_ub


def _loss1_grads(cstate: CompressionState, scores1, scores2, scores3,
                 s_ub, r_ub, sl2wd: float):
    """Analytic grads of sloss1/rloss1 (uvc_utils.py:177-217) plus the
    optional l2 pull toward zero (uvc_optimizer.py:63-66)."""
    y = jax.lax.stop_gradient(cstate.y)
    p = jax.lax.stop_gradient(cstate.p)

    def sloss1(s):
        sc = ste_ceil(s)
        lks_heads = least_k_sum(sc[:, 0], scores2)     # [L]
        lks_mlp = least_k_sum(sc[:, 1], scores3)       # [L]
        return jnp.dot(y[:, 0], lks_heads) + jnp.dot(y[:, 1], lks_mlp)

    def rloss1(r):
        rc = ste_ceil(r)
        lks = least_k_sum(rc, scores1)                 # [L, H]
        return jnp.sum(p * lks)

    s_grad1 = jax.grad(sloss1)(cstate.s) + sl2wd * (cstate.s / s_ub)
    r_grad1 = jax.grad(rloss1)(cstate.r) + sl2wd * (cstate.r / r_ub)
    return s_grad1, r_grad1


def _resource(key, s, r, gating, scores2, eps, table, cfg, hp,
              *, gumbel_hard: bool, warmup: bool):
    """One stochastic evaluation of the FLOPs fraction
    (UVC_CP_MiniMax.run_resource_fn, uvc_utils.py:220-224).

    With ``flops_with_mhsa=False`` the deterministic W1/W3 cost is used
    instead (flops2, uvc_utils.py:95-125) — it ignores gating and eps, so
    its gating gradient is identically zero."""
    if not hp.flops_with_mhsa:
        return flops2_fraction(ste_ceil(s), ste_ceil(r), scores2, cfg)
    if hp.enable_block_gating and gating is not None:
        distrib = block_gating_distrib(
            key, gating, use_gumbel=hp.use_gumbel, gumbel_hard=gumbel_hard,
            eps=eps, warmup=False)[:, 1]
    else:
        distrib = 1.0
    return flops_fraction(ste_ceil(s), ste_ceil(r), scores2, distrib,
                          table, cfg)


def _inf_norm_clip(g: jax.Array, max_norm: float = 1.0) -> jax.Array:
    """torch clip_grad_norm_(_, 1.0, inf): scale by max_norm/total when the
    max-abs exceeds max_norm."""
    total = jnp.max(jnp.abs(g))
    coef = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return g * coef


def arch_update(params: dict, cstate: CompressionState, *,
                key: jax.Array, step: jax.Array,
                gating_loss_grad: Optional[jax.Array],
                main_lr: jax.Array, hp: MinimaxHParams, cfg: ViTConfig,
                table: MacsTable, warmup: bool, gumbel_hard: bool
                ) -> Tuple[dict, CompressionState, Dict[str, jax.Array]]:
    """One architecture update; returns (params', cstate', metrics).

    ``params`` must already reflect this step's weight-optimizer update;
    prox is applied here first, matching the reference ordering
    (uvc_optimizer.py:42 before any scoring).
    """
    k_res1, k_res2, k_exp = jax.random.split(key, 3)
    s_ub, r_ub = s_r_upper_bounds(cfg)

    if hp.enable_pruning:
        params = prox_weights(params, ste_ceil(cstate.s), ste_ceil(cstate.r),
                              cstate.y, cstate.p, main_lr, cfg)

    scores1, scores2, scores3 = group_scores(params["blocks"], cfg.num_heads)
    gating = params.get("block_gating") if hp.enable_block_gating else None

    cur_resource = _resource(k_res1, cstate.s, cstate.r, gating, scores2,
                             cstate.eps, table, cfg, hp,
                             gumbel_hard=gumbel_hard, warmup=warmup)
    metrics = {"resource": cur_resource}

    if warmup:
        # reference returns right after prox + resource eval
        # (uvc_optimizer.py:52-58); duals/primal untouched during warmup.
        return params, cstate, metrics

    if not hp.enable_pruning:
        # gating-only path (uvc_optimizer_gating :148-161): dual-z ascent.
        z_excess = _resource(k_res2, cstate.s, cstate.r, gating, scores2,
                             cstate.eps, table, cfg, hp,
                             gumbel_hard=gumbel_hard,
                             warmup=warmup) - hp.budget
        z = jnp.maximum(cstate.z + cstate.zlr * z_excess, 0.0)
        return params, cstate.replace(z=z), metrics

    # ---- primal grads -----------------------------------------------------
    s_grad1, r_grad1 = _loss1_grads(cstate, scores1, scores2, scores3,
                                    s_ub, r_ub, hp.sl2wd)

    def clipped_excess(s, r, g):
        res = _resource(k_res1, s, r, g, scores2, cstate.eps, table, cfg, hp,
                        gumbel_hard=gumbel_hard, warmup=warmup)
        # torch_clamp for the boundary-inclusive gradient (torch clamp
        # semantics, uvc_optimizer.py:50)
        return torch_clamp(res - hp.budget, -hp.z_grad_clip, hp.z_grad_clip)

    if gating is not None:
        (s_grad2, r_grad2, g_grad_resource) = jax.grad(
            clipped_excess, argnums=(0, 1, 2))(cstate.s, cstate.r, gating)
    else:
        s_grad2, r_grad2 = jax.grad(clipped_excess, argnums=(0, 1))(
            cstate.s, cstate.r, gating)
        g_grad_resource = None

    z_detached = jax.lax.stop_gradient(cstate.z)
    s_grad = s_grad1 + z_detached * s_grad2
    r_grad = r_grad1 + z_detached * r_grad2

    # ---- gating interval update ------------------------------------------
    new_gating_accum = cstate.gating_accum
    new_gating_opt = cstate.gating_opt
    if gating is not None and gating_loss_grad is not None:
        g_grad = (gating_loss_grad
                  + z_detached * hp.gating_weight * g_grad_resource)
        # reference weights each accumulated grad by (step % interval)
        # before averaging over the window (uvc_optimizer.py:91-95).
        w = (step % hp.gating_interval).astype(g_grad.dtype)
        accum = cstate.gating_accum + g_grad * w
        do_step = (step + 1) % hp.gating_interval == 0
        mean_grad = accum / hp.gating_interval
        stepped, stepped_opt = optim.opt_step(
            "sgd", gating, mean_grad, cstate.gating_opt, hp.glr,
            momentum=0.9, weight_decay=1e-4)
        gating_new = jnp.where(do_step, stepped, gating)
        new_gating_opt = jax.tree.map(
            lambda a, b: jnp.where(do_step, a, b), stepped_opt,
            cstate.gating_opt)
        new_gating_accum = jnp.where(do_step, jnp.zeros_like(accum), accum)
        params = dict(params)
        params["block_gating"] = gating_new

    # ---- s step (boundary clamps, inf-norm clip, box) --------------------
    s_max = jnp.maximum(s_ub - 1.0 - 1e-8, 0.0)
    over_s = cstate.s >= s_max
    under_s = cstate.s <= 0.0
    s_grad = jnp.where(over_s, jnp.maximum(s_grad, 0.0), s_grad)
    s_grad = jnp.where(under_s, jnp.minimum(s_grad, 0.0), s_grad)
    s_grad = _inf_norm_clip(s_grad)
    s_new, s_opt = optim.opt_step(hp.soptim, cstate.s, s_grad, cstate.s_opt,
                                  hp.slr)
    s_new = jnp.maximum(s_new, 0.0)
    s_new = jnp.where(over_s, s_max, s_new)

    r_max = jnp.maximum(r_ub - 1.0 - 1e-8, 0.0)
    over_r = cstate.r >= r_max
    under_r = cstate.r <= 0.0
    r_grad = jnp.where(over_r, jnp.maximum(r_grad, 0.0), r_grad)
    r_grad = jnp.where(under_r, jnp.minimum(r_grad, 0.0), r_grad)
    r_grad = _inf_norm_clip(r_grad)
    r_new, r_opt = optim.opt_step(hp.roptim, cstate.r, r_grad, cstate.r_opt,
                                  hp.rlr)
    r_new = jnp.maximum(r_new, 0.0)
    r_new = jnp.where(over_r, r_max, r_new)

    # ---- dual ascent + projection ----------------------------------------
    # grad_y(-yloss) = -bottom-k score sums => y += ylr * least_norms
    # (uvc_utils.py:231-266, uvc_optimizer.py:126-135).  The reference's
    # dual loss is evaluated AFTER the in-place s/r optimizer steps and the
    # gating step (uvc_optimizer.py:108/120 precede :126), so the ascent
    # uses the POST-step primal values — verified differentially in
    # tests/test_reference_differential.py.
    sc = jnp.ceil(jax.lax.stop_gradient(s_new))
    rc = jnp.ceil(jax.lax.stop_gradient(r_new))
    least_s = jnp.stack([least_k_sum(sc[:, 0], scores2),
                         least_k_sum(sc[:, 1], scores3)], axis=-1)  # [L, 2]
    least_r = least_k_sum(rc, scores1)                              # [L, H]
    y_new = jnp.maximum(cstate.y + hp.ylr * least_s, 0.0)
    p_new = jnp.maximum(cstate.p + hp.plr * least_r, 0.0)
    # zloss draws a fresh gating sample (run_resource_fn inside zloss,
    # uvc_utils.py:268-269), also on the post-step primal/gating values.
    gating_for_z = params.get("block_gating") if gating is not None else None
    z_excess = _resource(k_res2, s_new, r_new, gating_for_z, scores2,
                         cstate.eps, table, cfg, hp,
                         gumbel_hard=gumbel_hard, warmup=warmup) - hp.budget
    z_new = jnp.maximum(cstate.z + cstate.zlr * z_excess, 0.0)

    cstate = cstate.replace(
        s=s_new, r=r_new, y=y_new, p=p_new, z=z_new,
        gating_accum=new_gating_accum, s_opt=s_opt, r_opt=r_opt,
        gating_opt=new_gating_opt)
    metrics["z"] = z_new
    return params, cstate, metrics
