"""Checkpoint save/restore.

Richer than the reference, which saves only ``model.state_dict()`` per epoch
and silently discards the dict carrying args/s/r stats (joint_train.py:
107-119 — a quirk SURVEY.md flags to fix, not copy).  Here a checkpoint is
the complete resumable training state: params, optimizer state, compression
state, and step — serialized with Orbax (async-capable, multi-host-safe)
with a msgpack fallback.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

from flax import serialization


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (msgpack; simple, portable, single-file)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


class OrbaxManager:
    """Epoch-indexed checkpoint manager (keeps the latest k)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        if not _HAVE_ORBAX:
            raise RuntimeError("orbax not available")
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if target is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
