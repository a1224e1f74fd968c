"""Device mesh, shardings, and multi-host initialization.

This module is the entire "distributed backend" of the framework — the
TPU-native replacement for the reference's apex DDP + NCCL process groups
(joint_train.py:292-293, :896-897) and SLURM/env:// multi-node rendezvous
(Baseline_pruning/utils.py:216+, run_with_submitit.py):

* **Data parallelism** (the reference's only strategy): the batch is sharded
  over the ``data`` mesh axis; jit partitions the train step SPMD and
  inserts the gradient all-reduce over ICI — no DDP wrapper, no bucketing
  knobs, no pre-division factor.  The minimax state is replicated and
  updated identically on every device inside the same program (the
  reference's unsynced-but-deterministic per-rank updates, SURVEY.md §2.4,
  become structurally correct).
* **Tensor parallelism** (beyond-reference capability for larger
  backbones): Megatron-style sharding of qkv/fc1 output features and
  proj/fc2 input features over the ``model`` axis; XLA inserts the
  activation all-reduces.
* **Multi-host**: ``jax.distributed.initialize`` over DCN; each host feeds
  its own shard of the input pipeline (``jax.process_index``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the DCN-level distributed runtime (multi-host slices).

    No-op on a single process.  Replaces torch.distributed NCCL init
    (joint_train.py:896-897)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices=None) -> Mesh:
    """1-D data mesh by default; (data, model) when mp > 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp({dp}) * mp({mp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("data", "model"))


def param_partition_spec(path: str, leaf, mp: int) -> P:
    """Megatron-style tensor-parallel partition specs.

    Stacked block tensors carry a leading layer axis:
      qkv.kernel [L, D, 3D] -> shard 3D (column parallel)
      fc1.kernel [L, D, F]  -> shard F  (column parallel)
      proj.kernel [L, D, D] -> shard input D (row parallel)
      fc2.kernel [L, F, D]  -> shard F  (row parallel)
    Everything else is replicated.
    """
    if mp <= 1:
        return P()
    if "'blocks'" in path:
        if "qkv" in path and "kernel" in path:
            return P(None, None, "model")
        if "fc1" in path and "kernel" in path:
            return P(None, None, "model")
        if "qkv" in path and "bias" in path:
            return P(None, "model")
        if "fc1" in path and "bias" in path:
            return P(None, "model")
        if "proj" in path and "kernel" in path:
            return P(None, "model", None)
        if "fc2" in path and "kernel" in path:
            return P(None, "model", None)
    return P()


def shard_params(params, mesh: Mesh, mp: int = 1):
    """device_put the param pytree with TP/replicated shardings."""

    def place(path, leaf):
        spec = param_partition_spec(jax.tree_util.keystr(path), leaf, mp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh.

    Multi-host: every process holds the complete (identical) value, so the
    global replicated array is assembled from the process-local copy with
    make_array_from_process_local_data; single-host is a plain device_put."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over the data axis.

    Multi-host: each process holds its own per-host slice (the loaders
    shard by jax.process_index), so the global array is assembled with
    make_array_from_process_local_data; single-host uses a plain
    device_put to the NamedSharding."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    dp = mesh.shape["data"]
    for leaf in jax.tree.leaves(batch):
        if leaf.shape[0] % dp != 0:
            raise ValueError(
                f"batch {leaf.shape[0]} is not divisible by the "
                f"data-parallel mesh size {dp}; pick --train_batch_size "
                f"as a multiple of it")
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
