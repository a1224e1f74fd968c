"""Tiny pure-functional optimizers with exact torch update semantics.

The minimax engine steps its s/r/gating variables with torch SGD / Adam /
RMSprop (UVC/uvc_optimizer.py:219-266).  These are deliberately re-derived
from the torch update rules (not optax, whose Adam bias-correction and SGD
momentum conventions differ slightly) so stage-1 trajectories are comparable
with the reference logs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from uvc_tpu.compress.state import OptState


def init_opt_state(kind: str, param: jax.Array) -> OptState:
    z = jnp.zeros_like(param)
    if kind == "sgd":
        return OptState(m=z, v=None, count=jnp.zeros((), jnp.int32))
    if kind in ("adam", "rmsprop"):
        return OptState(m=z, v=z, count=jnp.zeros((), jnp.int32))
    raise ValueError(f"unknown optimizer {kind!r}")


def opt_step(kind: str, param: jax.Array, grad: jax.Array, state: OptState,
             lr: float, *, momentum: float = 0.0, weight_decay: float = 0.0,
             betas=(0.0, 0.999), eps: float = 1e-8,
             alpha: float = 0.99):
    """One optimizer step; returns (new_param, new_state).

    torch semantics: SGD ``buf = mu*buf + g`` (dampening 0), update with
    ``buf``; Adam with bias correction and eps outside the sqrt; RMSprop
    square-average with ``alpha``.
    """
    if weight_decay:
        grad = grad + weight_decay * param
    count = state.count + 1
    if kind == "sgd":
        if momentum:
            buf = momentum * state.m + grad
            upd = buf
        else:
            buf = state.m
            upd = grad
        return param - lr * upd, OptState(m=buf, v=None, count=count)
    if kind == "adam":
        b1, b2 = betas
        m = b1 * state.m + (1 - b1) * grad
        v = b2 * state.v + (1 - b2) * grad * grad
        t = count.astype(param.dtype)
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        return (param - lr * mhat / (jnp.sqrt(vhat) + eps),
                OptState(m=m, v=v, count=count))
    if kind == "rmsprop":
        v = alpha * state.v + (1 - alpha) * grad * grad
        return (param - lr * grad / (jnp.sqrt(v) + eps),
                OptState(m=state.m, v=v, count=count))
    raise ValueError(f"unknown optimizer {kind!r}")
