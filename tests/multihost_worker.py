"""Worker process for the multi-process (DCN) data-parallel test.

Launched by tests/test_multiprocess.py as ``python multihost_worker.py
<pid> <nproc> <port> <outdir>``.  Each worker owns 4 virtual CPU devices
and joins a 2-process jax.distributed cluster over a localhost
coordinator — the CPU-world stand-in for multi-host TPU pods over DCN.
This executes the one code path no single-process test can reach:
``initialize_multihost`` (parallel/mesh.py) + the ``process_count > 1``
branch of ``shard_batch``/``replicate`` (make_array_from_process_local_data)
+ per-host loader sharding (pid/pcount), i.e. the TPU-native equivalent of
the reference's env:// NCCL rendezvous (UVC/joint_train.py:896-897,
Baseline_pruning/utils.py:216+).
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    # the parent test session forces an 8-virtual-device XLA_FLAGS; this
    # process must instead expose 4 local devices per process
    os.environ["XLA_FLAGS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from uvc_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    from uvc_tpu.configs import get_config
    from uvc_tpu.compress.minimax import init_compression_state
    from uvc_tpu.compress.resource import build_macs_table
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.data.pipeline import ArrayLoader
    from uvc_tpu.models import vit
    from uvc_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage1_step

    cfg = get_config("testing")
    # mixup off: the multi-process global batch interleaves the two host
    # shards, so sample order differs from any single stream; the loss and
    # grads are permutation-invariant only without cross-sample mixing
    hp = MinimaxHParams(gating_interval=2, enable_patch_gating=0)
    thp = TrainHParams(num_classes=cfg.num_classes, t_total=100,
                       warmup_steps=2, mixup=0.0, cutmix=0.0,
                       compute_dtype=jnp.float32)
    table = build_macs_table(cfg)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    teacher = vit.init_params(jax.random.PRNGKey(1), cfg)

    # deterministic dataset shared by every process and by the reference
    # single-process run in the test driver
    rng = np.random.default_rng(7)
    n, global_batch, steps = 32, 8, 3
    x_all = rng.integers(0, 256, (n, cfg.img_size, cfg.img_size, 3),
                         dtype=np.uint8)
    y_all = rng.integers(0, cfg.num_classes, (n,)).astype(np.int32)

    loader = ArrayLoader(x_all, y_all, global_batch // nproc, train=True,
                         img_size=cfg.img_size, seed=11, pid=pid,
                         pcount=nproc)
    loader.set_epoch(0)

    mesh = make_mesh()
    assert mesh.shape["data"] == 4 * nproc
    state = create_train_state(params, thp, init_compression_state(cfg, hp))
    state = replicate(state, mesh)
    teacher_g = replicate(teacher, mesh)
    step_fn = build_stage1_step(cfg, table, hp, thp, warmup=False,
                                donate=False)

    losses = []
    base_key = jax.random.PRNGKey(3)
    for i, (xb, yb) in enumerate(loader):
        if i >= steps:
            break
        xg, yg = shard_batch((xb.astype(np.float32), yb), mesh)
        assert xg.shape[0] == global_batch  # global, not per-host
        key = replicate(jax.random.fold_in(base_key, i), mesh)
        tau = replicate(jnp.asarray(-1.0), mesh)
        state, m = step_fn(state, teacher_g, xg, yg, key, tau)
        losses.append(float(jax.device_get(m["loss"])))

    result = {
        "pid": pid,
        "losses": losses,
        "s": np.asarray(jax.device_get(state.cstate.s)).tolist(),
        "z": float(jax.device_get(state.cstate.z)),
        "qkv_sum": float(jax.device_get(jnp.sum(jnp.abs(
            state.params["blocks"]["qkv"]["kernel"])))),
    }
    with open(os.path.join(outdir, f"worker_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
