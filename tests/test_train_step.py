"""End-to-end smoke tests of the jitted stage-1 / stage-2 steps on the tiny
config, plus directional checks on the minimax dynamics (the reference has
no tests; published-log trajectories are the only oracle, so here we assert
the qualitative invariants: duals grow while over budget, s/r stay in their
boxes, resource moves toward the budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvc_tpu.configs import get_config
from uvc_tpu.compress.minimax import init_compression_state
from uvc_tpu.compress.resource import build_macs_table
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.models import vit
from uvc_tpu.train.state import TrainHParams, create_train_state
from uvc_tpu.train.step import (build_eval_step, build_stage1_step,
                                build_stage2_step)

CFG = get_config("testing")


def _params(seed):
    p = vit.init_params(jax.random.PRNGKey(seed), CFG)
    # zero-init head (reference parity) blocks backbone grads; randomize it
    # so gradient flow is testable
    p["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(seed + 100), p["head"]["kernel"].shape) * 0.1
    return p


def _setup(hp=None, thp=None):
    hp = hp or MinimaxHParams(gating_interval=2, zlr_schedule=(1,),
                              enable_patch_gating=0)
    thp = thp or TrainHParams(num_classes=CFG.num_classes, t_total=100,
                              warmup_steps=2, compute_dtype=jnp.float32)
    table = build_macs_table(CFG)
    params = _params(0)
    teacher = _params(1)
    cstate = init_compression_state(CFG, hp)
    state = create_train_state(params, thp, cstate)
    return hp, thp, table, state, teacher


def _batch(b=4):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (b, CFG.img_size, CFG.img_size, CFG.in_chans))
    y = jax.random.randint(key, (b,), 0, CFG.num_classes)
    return x, y


def test_stage1_warmup_step_runs():
    hp, thp, table, state, teacher = _setup()
    step = build_stage1_step(CFG, table, hp, thp, warmup=True, donate=False)
    x, y = _batch()
    new_state, metrics = step(state, teacher, x, y, jax.random.PRNGKey(3),
                              jnp.asarray(-1.0))
    # second step: the lr warmup ramp starts at 0, so weights only move
    # from step 1 onward
    new_state, metrics = step(new_state, teacher, x, y,
                              jax.random.PRNGKey(7), jnp.asarray(-1.0))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 < float(metrics["resource"]) <= 1.0 + 1e-6
    # warmup: minimax primal/dual untouched
    np.testing.assert_allclose(new_state.cstate.s, state.cstate.s)
    np.testing.assert_allclose(new_state.cstate.z, state.cstate.z)
    # weights did move
    assert not np.allclose(new_state.params["blocks"]["qkv"]["kernel"],
                           state.params["blocks"]["qkv"]["kernel"])
    # gating frozen during warmup
    np.testing.assert_allclose(new_state.params["block_gating"],
                               state.params["block_gating"])


def test_stage1_uvc_steps_move_duals_and_primal():
    hp, thp, table, state, teacher = _setup()
    step = build_stage1_step(CFG, table, hp, thp, warmup=False, donate=False)
    x, y = _batch()
    key = jax.random.PRNGKey(4)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, teacher, x, y, sub, jnp.asarray(-1.0))
    cs = state.cstate
    # duals must have increased (resource starts at 1.0 > budget 0.5,
    # least-norm sums are >= 0)
    assert float(cs.z) > float(MinimaxHParams().z_init)
    assert np.all(np.asarray(cs.y) >= MinimaxHParams().y_init)
    # s/r in box
    s_ub = np.array([CFG.num_heads, CFG.mlp_hidden])
    assert np.all(np.asarray(cs.s) >= 0)
    assert np.all(np.asarray(cs.s) <= s_ub)
    assert np.all(np.asarray(cs.r) >= 0)
    assert np.all(np.asarray(cs.r) <= CFG.head_size)
    assert np.isfinite(float(metrics["loss"]))


def test_stage1_resource_decreases_under_pressure():
    """With a large dual step the FLOPs fraction must fall toward budget."""
    hp = MinimaxHParams(gating_interval=2, zlr_schedule=(50,),
                        slr=0.5, rlr=0.5, enable_patch_gating=0,
                        use_gumbel=False)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=200,
                       warmup_steps=2, compute_dtype=jnp.float32)
    table = build_macs_table(CFG)
    params = _params(0)
    teacher = _params(1)
    state = create_train_state(params, thp, init_compression_state(CFG, hp))
    step = build_stage1_step(CFG, table, hp, thp, warmup=False, donate=False)
    x, y = _batch()
    key = jax.random.PRNGKey(5)
    first = None
    for i in range(25):
        key, sub = jax.random.split(key)
        state, metrics = step(state, teacher, x, y, sub, jnp.asarray(-1.0))
        if first is None:
            first = float(metrics["resource"])
    last = float(metrics["resource"])
    assert last < first, (first, last)


def test_stage2_step_runs_and_freezes_gating():
    from uvc_tpu.compress.masks import build_masks
    hp = MinimaxHParams(enable_patch_gating=0)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                       warmup_steps=2, compute_dtype=jnp.float32)
    params = _params(0)
    teacher = _params(1)
    state = create_train_state(params, thp, None)
    masks = build_masks(params, jnp.array([[0.0, 8.0]]), jnp.array([[2.0]]),
                        CFG)
    step = build_stage2_step(CFG, hp, thp, donate=False)
    x, y = _batch()
    new_state, metrics = step(state, teacher, masks, x, y,
                              jax.random.PRNGKey(6))
    # second step: the lr warmup ramp starts at 0 at step 0
    new_state, metrics = step(new_state, teacher, masks, x, y,
                              jax.random.PRNGKey(8))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(new_state.params["block_gating"],
                               state.params["block_gating"])
    assert not np.allclose(new_state.params["blocks"]["fc1"]["kernel"],
                           state.params["blocks"]["fc1"]["kernel"])


def test_stage2_token_select_serving_semantics():
    """Stage 2 trains under the DETERMINISTIC serving token drop when
    hp mode 2 is on (r4: fine-tuning full-token and serving token-dropped
    cost 11.4 points of phantom accuracy on the hardened e2e task):
    the mask is actually applied, the scorer is frozen (zero update incl.
    weight decay), and the eval step is noise-free (key-independent)."""
    from uvc_tpu.compress.masks import build_masks
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                       warmup_steps=2, compute_dtype=jnp.float32)
    params = _params(0)
    teacher = _params(1)
    masks = build_masks(params, jnp.array([[0.0, 8.0]]), jnp.array([[2.0]]),
                        CFG)
    x, y = _batch()

    losses = {}
    for mode in (0, 2):
        hp = MinimaxHParams(enable_patch_gating=mode, patch_ratio=0.5)
        state = create_train_state(jax.tree.map(jnp.copy, params), thp,
                                   None)
        step = build_stage2_step(CFG, hp, thp, donate=False)
        new_state, m = step(state, teacher, masks, x, y,
                            jax.random.PRNGKey(6))
        losses[mode] = float(m["loss"])
        # second step: the lr warmup ramp starts at 0 at step 0
        new_state, _ = step(new_state, teacher, masks, x, y,
                            jax.random.PRNGKey(8))
        if mode == 2:
            # scorer frozen: grad through the piecewise-constant top-k
            # mask is zero AND decoupled weight decay must not drift it
            for a, b in zip(jax.tree.leaves(params["token_scorer"]),
                            jax.tree.leaves(
                                new_state.params["token_scorer"])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert not np.allclose(
                new_state.params["blocks"]["fc1"]["kernel"],
                params["blocks"]["fc1"]["kernel"])
    # dropping half the patch tokens must actually change the loss
    assert losses[0] != losses[2]

    # eval is the serving decision rule: noise-free, key-independent
    hp = MinimaxHParams(enable_patch_gating=2, patch_ratio=0.5)
    ev = build_eval_step(CFG, hp, thp, masked=True)
    m1 = ev(params, masks, x, y, jax.random.PRNGKey(0))
    m2 = ev(params, masks, x, y, jax.random.PRNGKey(123))
    assert int(m1["correct"]) == int(m2["correct"])
    np.testing.assert_allclose(float(m1["loss_sum"]),
                               float(m2["loss_sum"]), rtol=1e-6)


def test_eval_step_counts():
    hp = MinimaxHParams(enable_patch_gating=0)
    thp = TrainHParams(num_classes=CFG.num_classes,
                       compute_dtype=jnp.float32)
    params = _params(0)
    step = build_eval_step(CFG, hp, thp, masked=False)
    x, y = _batch(8)
    m = step(params, None, x, y, jax.random.PRNGKey(0))
    assert int(m["count"]) == 8
    assert 0 <= int(m["correct"]) <= 8
    assert np.isfinite(float(m["loss_sum"]))


def test_stage1_part_gating_bf16():
    """Part gating (attn/mlp half skipping, model_distilled.py:218-234)
    must not promote the bf16 scan carry (regression)."""
    hp = MinimaxHParams(gating_interval=2, enable_patch_gating=0,
                        enable_part_gating=True)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                       warmup_steps=2, compute_dtype=jnp.bfloat16)
    from uvc_tpu.compress.resource import build_macs_table
    table = build_macs_table(CFG)
    params = _params(0)
    teacher = _params(1)
    state = create_train_state(params, thp, init_compression_state(CFG, hp))
    step = build_stage1_step(CFG, table, hp, thp, warmup=False, donate=False)
    x, y = _batch()
    new_state, metrics = step(state, teacher, x, y, jax.random.PRNGKey(3),
                              jnp.asarray(-1.0))
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accum_matches_full_batch():
    """N=2 accumulation at batch B must equal one step at batch 2B
    (joint_train.py:414-424: loss/N micro backward, boundary applies
    clip + AdamW + arch update).  Deterministic setup: mixup off,
    softl0 gating, no token selection."""
    import dataclasses
    hp = MinimaxHParams(gating_interval=2, zlr_schedule=(1,),
                        enable_patch_gating=0, use_gumbel=False)
    thp_full = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                            warmup_steps=0, mixup=0.0, cutmix=0.0,
                            compute_dtype=jnp.float32)
    thp_accum = dataclasses.replace(thp_full, accum_steps=2)
    table = build_macs_table(CFG)
    x, y = _batch(4)
    key = jax.random.PRNGKey(3)
    tau = jnp.asarray(-1.0)

    params, teacher = _params(0), _params(1)
    state_full = create_train_state(params, thp_full,
                                    init_compression_state(CFG, hp))
    full = build_stage1_step(CFG, table, hp, thp_full, warmup=False,
                             donate=False)
    sf, mf = full(state_full, teacher, x, y, key, tau)

    state_acc = create_train_state(params, thp_accum,
                                   init_compression_state(CFG, hp))
    micro = build_stage1_step(CFG, table, hp, thp_accum, warmup=False,
                              donate=False, micro=True)
    boundary = build_stage1_step(CFG, table, hp, thp_accum, warmup=False,
                                 donate=False)
    state_acc, _ = micro(state_acc, teacher, x[:2], y[:2], key, tau)
    sa, ma = boundary(state_acc, teacher, x[2:], y[2:], key, tau)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
                 sf.params, sa.params)
    np.testing.assert_allclose(sf.cstate.s, sa.cstate.s, atol=1e-6)
    np.testing.assert_allclose(sf.cstate.z, sa.cstate.z, atol=1e-6)
    assert int(sa.step) == 1  # micro steps do not advance the step counter
    # the boundary cleared the accumulation buffer
    assert float(optax_global_norm(sa.grad_accum)) == 0.0


def optax_global_norm(tree):
    import optax
    return optax.global_norm(tree)


def test_warmup_lr_pins_weight_lr():
    """During warmup epochs the weight optimizer runs at the constant
    --warmup_lr (joint_train.py:351); the UVC phase returns to the cosine
    schedule."""
    import dataclasses
    hp = MinimaxHParams(gating_interval=2, zlr_schedule=(1,),
                        enable_patch_gating=0, use_gumbel=False)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                       warmup_steps=0, learning_rate=1e-3, warmup_lr=3.3e-5,
                       mixup=0.0, cutmix=0.0, compute_dtype=jnp.float32)
    table = build_macs_table(CFG)
    params, teacher = _params(0), _params(1)
    state = create_train_state(params, thp, init_compression_state(CFG, hp))
    warm = build_stage1_step(CFG, table, hp, thp, warmup=True, donate=False)
    uvc = build_stage1_step(CFG, table, hp, thp, warmup=False, donate=False)
    x, y = _batch(4)
    key = jax.random.PRNGKey(9)
    tau = jnp.asarray(-1.0)
    for _ in range(2):
        state, metrics = warm(state, teacher, x, y, key, tau)
        np.testing.assert_allclose(float(metrics["lr"]), 3.3e-5, rtol=1e-6)
    state, metrics = uvc(state, teacher, x, y, key, tau)
    # cosine schedule value at step 2 of 100 with lr 1e-3 (warmup_steps=0)
    sched = thp.lr_schedule()
    np.testing.assert_allclose(float(metrics["lr"]), float(sched(2)),
                               rtol=1e-6)
    assert abs(float(metrics["lr"]) - 3.3e-5) > 1e-6


def test_flops2_arch_update_path():
    """--flops_with_mhsa 0 selects the W1/W3 cost inside the minimax step
    (uvc_optimizer.py:191-200); the step must run and report it."""
    hp = MinimaxHParams(gating_interval=2, zlr_schedule=(5,), slr=0.5,
                        rlr=0.5, enable_patch_gating=0, use_gumbel=False,
                        flops_with_mhsa=False)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=200,
                       warmup_steps=0, mixup=0.0, cutmix=0.0,
                       compute_dtype=jnp.float32)
    table = build_macs_table(CFG)
    params, teacher = _params(0), _params(1)
    state = create_train_state(params, thp, init_compression_state(CFG, hp))
    step = build_stage1_step(CFG, table, hp, thp, warmup=False, donate=False)
    x, y = _batch(4)
    key = jax.random.PRNGKey(5)
    first = None
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, metrics = step(state, teacher, x, y, sub, jnp.asarray(-1.0))
        if first is None:
            first = float(metrics["resource"])
    assert np.isfinite(first) and 0 < first <= 1.0 + 1e-6
    # under dual pressure the W1/W3 cost must fall toward the 0.5 budget
    assert float(metrics["resource"]) < first


def test_bundled_step_matches_separate_steps():
    """build_stage1_step(bundle=k) scans k batches in ONE program (launch-
    latency amortization); the result must equal k separate step calls
    with the same folded keys."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uvc_tpu.compress.minimax import init_compression_state
    from uvc_tpu.compress.resource import build_macs_table
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage1_step

    cfg = get_config("testing")
    hp = MinimaxHParams(gating_interval=2, enable_patch_gating=0)
    thp = TrainHParams(num_classes=cfg.num_classes, t_total=100,
                       warmup_steps=2, mixup=0.8, cutmix=1.0)
    table = build_macs_table(cfg)
    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    teacher = vit.init_params(jax.random.PRNGKey(1), cfg)
    k = 3
    xs = jax.random.normal(jax.random.PRNGKey(2),
                           (k, 4, cfg.img_size, cfg.img_size, 3))
    ys = jax.random.randint(jax.random.PRNGKey(3), (k, 4), 0,
                            cfg.num_classes)
    base = jax.random.PRNGKey(7)

    sep = build_stage1_step(cfg, table, hp, thp, warmup=False, donate=False)
    st1 = create_train_state(jax.tree.map(jnp.copy, params), thp,
                             init_compression_state(cfg, hp))
    losses = []
    for i in range(k):
        st1, m = sep(st1, teacher, xs[i], ys[i],
                     jax.random.fold_in(base, i), jnp.asarray(5.0))
        losses.append(float(m["loss"]))

    bun = build_stage1_step(cfg, table, hp, thp, warmup=False, donate=False,
                            bundle=k)
    st2 = create_train_state(jax.tree.map(jnp.copy, params), thp,
                             init_compression_state(cfg, hp))
    st2, ms = bun(st2, teacher, xs, ys, jnp.full((k,), 5.0), base)

    np.testing.assert_allclose(np.asarray(ms["loss"]), np.asarray(losses),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st1.cstate.s),
                               np.asarray(st2.cstate.s), rtol=1e-5,
                               atol=1e-5)
    assert int(st2.step) == k


def test_stage2_bundled_step_matches_separate_steps():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage2_step

    cfg = get_config("testing")
    hp = MinimaxHParams(enable_patch_gating=0)
    thp = TrainHParams(num_classes=cfg.num_classes, t_total=100,
                       warmup_steps=2, mixup=0.8, cutmix=1.0)
    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    teacher = vit.init_params(jax.random.PRNGKey(1), cfg)
    masks = build_masks(params, jnp.zeros((cfg.depth, 2)),
                        jnp.zeros((cfg.depth, cfg.num_heads)), cfg)
    k = 2
    xs = jax.random.normal(jax.random.PRNGKey(2),
                           (k, 4, cfg.img_size, cfg.img_size, 3))
    ys = jax.random.randint(jax.random.PRNGKey(3), (k, 4), 0,
                            cfg.num_classes)
    base = jax.random.PRNGKey(7)

    sep = build_stage2_step(cfg, hp, thp, donate=False)
    st1 = create_train_state(jax.tree.map(jnp.copy, params), thp, None)
    losses = []
    for i in range(k):
        st1, m = sep(st1, teacher, masks, xs[i], ys[i],
                     jax.random.fold_in(base, i))
        losses.append(float(m["loss"]))

    bun = build_stage2_step(cfg, hp, thp, donate=False, bundle=k)
    st2 = create_train_state(jax.tree.map(jnp.copy, params), thp, None)
    st2, ms = bun(st2, teacher, masks, xs, ys, base)
    np.testing.assert_allclose(np.asarray(ms["loss"]), np.asarray(losses),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_timm_epoch_schedule_matches_timm_values():
    """Stage-2 --sched surface (post_train.py:302, :350, :469-482): the
    per-epoch lr series must match timm's CosineLRScheduler /
    StepLRScheduler values for the published stage-2 recipe (lr 5e-4,
    min_lr 1e-5, warmup_lr 1e-6, warmup_epochs 5, epochs 100).  timm is
    not installed here; expectations are computed from timm's documented
    formulas (cosine_lr.py: warmup_lr_init + t*step; lr_min +
    0.5*(base-min)*(1+cos(pi*t/t_initial)); cycle_limit=1 -> lr_min after
    t_initial; step_lr.py: base*rate**(t//decay_t))."""
    import math

    from uvc_tpu.utils.schedules import timm_epoch_schedule

    base, mn, wl, wt, ep = 5e-4, 1e-5, 1e-6, 5, 100
    spe = 10  # steps per epoch; lr must be constant within an epoch
    cos = timm_epoch_schedule("cosine", base, epochs=ep,
                              steps_per_epoch=spe, min_lr=mn, warmup_lr=wl,
                              warmup_epochs=wt)

    def timm_cosine(t):
        if t < wt:
            return wl + t * (base - wl) / wt
        if t >= ep:
            return mn
        return mn + 0.5 * (base - mn) * (1 + math.cos(math.pi * t / ep))

    for t in [0, 1, 2, 4, 5, 6, 30, 50, 99, 100, 120]:
        got = float(cos(t * spe))            # first step of epoch t
        got_mid = float(cos(t * spe + spe - 1))  # last step of epoch t
        np.testing.assert_allclose(got, timm_cosine(t), rtol=1e-6,
                                   err_msg=f"epoch {t}")
        np.testing.assert_allclose(got_mid, got, rtol=1e-6)

    st = timm_epoch_schedule("step", base, epochs=ep, steps_per_epoch=spe,
                             min_lr=mn, warmup_lr=wl, warmup_epochs=wt,
                             decay_epochs=30, decay_rate=0.1)

    def timm_step(t):
        if t < wt:
            return wl + t * (base - wl) / wt
        return base * 0.1 ** (t // 30)

    for t in [0, 3, 5, 10, 29, 30, 59, 60, 95]:
        np.testing.assert_allclose(float(st(t * spe)), timm_step(t),
                                   rtol=1e-6, err_msg=f"epoch {t}")


def test_stage2_step_uses_sched_lr():
    """A stage-2 step built with thp.sched='cosine' reports the per-epoch
    timm lr in its metrics (flag wiring: cli/flags.py add_stage2_flags ->
    to_train_hparams -> TrainHParams.lr_schedule)."""
    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.ops.stes import ste_ceil

    cfg = get_config("testing")
    hp = MinimaxHParams(gating_interval=2, enable_patch_gating=0)
    thp = TrainHParams(num_classes=cfg.num_classes, mixup=0.0, cutmix=0.0,
                       num_epochs=10, warmup_epochs=0, sched="cosine",
                       min_lr=1e-5, steps_per_epoch=3,
                       compute_dtype=jnp.float32)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    cstate = init_compression_state(cfg, hp)
    masks = build_masks(params, ste_ceil(cstate.s), ste_ceil(cstate.r), cfg)
    state = create_train_state(params, thp, None)
    step = build_stage2_step(cfg, hp, thp, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (4, cfg.img_size, cfg.img_size, 3))
    y = jnp.zeros((4,), jnp.int32)
    _, m = step(state, params, masks, x, y, jax.random.PRNGKey(2))
    # epoch 0 of 10, no warmup: lr = min + (base-min)/2 * (1+cos(0)) = base
    np.testing.assert_allclose(float(m["lr"]), thp.learning_rate, rtol=1e-6)


def test_opt_sgd_matches_torch():
    """--opt sgd/momentum (stage-2 timm create_optimizer surface,
    post_train.py:455-466): one step must match torch.optim.SGD with
    coupled weight decay (timm 'sgd' = nesterov, 'momentum' = plain)."""
    import torch

    from uvc_tpu.train.state import TrainHParams, make_weight_optimizer

    w0 = np.linspace(-1.0, 1.0, 12).astype(np.float32)
    g0 = np.linspace(0.5, -0.7, 12).astype(np.float32)
    for opt_name, nesterov in [("sgd", True), ("momentum", False)]:
        thp = TrainHParams(learning_rate=0.1, weight_decay=0.05,
                           warmup_steps=0, t_total=10, opt=opt_name,
                           momentum=0.9, sched="step", min_lr=0.1,
                           steps_per_epoch=1, warmup_epochs=0,
                           decay_epochs=100)
        tx = make_weight_optimizer(thp)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        new = params
        for _ in range(3):   # momentum buffer engages from step 2
            updates, state = tx.update({"w": jnp.asarray(g0)}, state, new)
            new = jax.tree.map(lambda p, u: p + u, new, updates)

        tw = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9,
                               weight_decay=0.05, nesterov=nesterov)
        for _ in range(3):
            topt.zero_grad()
            tw.grad = torch.tensor(g0)
            topt.step()
        np.testing.assert_allclose(np.asarray(new["w"]),
                                   tw.detach().numpy(), rtol=1e-5,
                                   atol=1e-6, err_msg=opt_name)
