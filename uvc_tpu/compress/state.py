"""Compression (minimax) state and hyperparameters.

The reference scatters this state across a ``UVC_CP_MiniMax`` nn.Module
(primal s/r, duals y/p/z — UVC/uvc_utils.py:141-148), four torch optimizers
(UVC/uvc_optimizer.py:219-266), a Python list of accumulated gating grads
(joint_train.py:337, uvc_optimizer.py:91-97), and mutable model attributes
(eps, enable_warmup).  Here it is one immutable pytree carried through the
jitted train step; the whole architecture update is pure SPMD-replicated
compute, which makes the reference's "per-rank updates stay consistent only
by determinism" subtlety (SURVEY.md §2.4) trivially correct.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MinimaxHParams:
    """Static hyperparameters of the minimax engine (CLI flag parity:
    joint_train.py:748-871)."""

    budget: float = 0.5
    slr: float = 0.02
    rlr: float = 0.02
    glr: float = 1e-3
    ylr: float = 1e-4
    plr: float = 1e-4
    zlr_schedule: tuple = (10, 20, 30, 40, 50)  # --zlr_schedule_list
    sl2wd: float = 0.0
    z_grad_clip: float = 0.5
    gating_weight: float = 5.0
    gating_interval: int = 100
    soptim: str = "sgd"      # sgd | adam | rmsprop
    roptim: str = "sgd"
    # True: full MACs-table cost (calc_flops); False: the W1/W3 linear-layer
    # alternative (flops2, uvc_utils.py:95-125 — --flops_with_mhsa 0)
    flops_with_mhsa: bool = True
    use_gumbel: bool = True
    eps: float = 0.1
    eps_decay: float = 0.92
    enable_block_gating: bool = True
    enable_part_gating: bool = False
    enable_patch_gating: int = 2   # 0=off, 1=sigmoid gate, 2=token top-k
    enable_jumping: bool = False
    enable_pruning: bool = True
    patch_ratio: float = 0.9
    z_init: float = 1e-3
    y_init: float = 1e-3
    p_init: float = 1e-3

    def zlr_for_epoch(self, epoch: int, num_epochs: int) -> float:
        """Staircase dual-z step size.

        Reference builds ``{i*gap: list[i]}`` with gap = num_epochs //
        len(list) (joint_train.py:999-1005) and applies it per *epoch*
        via PresetLRScheduler (joint_train.py:441-442) — i.e. the zlr in
        effect is the largest schedule entry with key <= epoch.
        """
        sched = self.zlr_schedule
        gap = max(1, num_epochs // max(1, len(sched)))
        zlr = float(sched[0])
        for i, v in enumerate(sched):
            if epoch >= i * gap:
                zlr = float(v)
        return zlr


class OptState(flax.struct.PyTreeNode):
    """Per-variable state for the tiny torch-semantics optimizers
    (compress/optim.py)."""

    m: Any = None        # momentum / first moment
    v: Any = None        # second moment (adam / rmsprop)
    count: jax.Array = flax.struct.field(default=None)


class CompressionState(flax.struct.PyTreeNode):
    """All dynamic minimax variables, as one replicated pytree."""

    s: jax.Array          # [L, 2]  heads-removed, mlp-units-removed
    r: jax.Array          # [L, H]  per-head dims removed
    y: jax.Array          # [L, 2]  dual for s
    p: jax.Array          # [L, H]  dual for r
    z: jax.Array          # scalar dual for the FLOPs budget
    eps: jax.Array        # softl0 epsilon (decayed per epoch)
    zlr: jax.Array        # current staircase z step size
    gating_accum: jax.Array            # [L, 2] accumulated gating grads
    s_opt: OptState
    r_opt: OptState
    gating_opt: OptState  # SGD-momentum trace for the interval update
