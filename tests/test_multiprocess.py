"""Multi-process (DCN) data parallelism: 2 OS processes x 4 CPU devices.

The reference trains multi-node via torch.distributed env:// rendezvous +
NCCL (UVC/joint_train.py:896-897, Baseline_pruning/utils.py:216+,
run_with_submitit.py).  The TPU-native equivalent is
``jax.distributed.initialize`` over DCN with per-host input sharding; this
test executes that path for real: two spawned worker processes form a
jax.distributed cluster over a localhost coordinator (gloo CPU
collectives), build one global 8-device mesh, feed per-host-sharded
loaders through ``shard_batch``'s make_array_from_process_local_data
branch, run 3 full stage-1 steps, and must agree with a single-process run
of the same global batches.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    outdir = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(outdir)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(outdir / f"worker_{pid}.json") as f:
            results.append(json.load(f))
    return results


def test_two_processes_agree(worker_results):
    """Both processes of the cluster must observe identical losses and
    identical (replicated) minimax state — the structural guarantee the
    reference only gets from seed determinism (SURVEY.md §2.4)."""
    r0, r1 = worker_results
    assert len(r0["losses"]) == 3
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["s"], r1["s"], rtol=1e-6)
    np.testing.assert_allclose(r0["z"], r1["z"], rtol=1e-6)
    np.testing.assert_allclose(r0["qkv_sum"], r1["qkv_sum"], rtol=1e-6)


def test_multiprocess_matches_single_process(worker_results):
    """The 2-process global-mesh run must match a single-process run over
    the same global batches (loss, s, z, and weights)."""
    import jax
    import jax.numpy as jnp

    from uvc_tpu.configs import get_config
    from uvc_tpu.compress.minimax import init_compression_state
    from uvc_tpu.compress.resource import build_macs_table
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.data.pipeline import ArrayLoader
    from uvc_tpu.models import vit
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage1_step

    cfg = get_config("testing")
    hp = MinimaxHParams(gating_interval=2, enable_patch_gating=0)
    thp = TrainHParams(num_classes=cfg.num_classes, t_total=100,
                       warmup_steps=2, mixup=0.0, cutmix=0.0,
                       compute_dtype=jnp.float32)
    table = build_macs_table(cfg)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    teacher = vit.init_params(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(7)
    n, global_batch, steps = 32, 8, 3
    x_all = rng.integers(0, 256, (n, cfg.img_size, cfg.img_size, 3),
                         dtype=np.uint8)
    y_all = rng.integers(0, cfg.num_classes, (n,)).astype(np.int32)

    # reproduce the 2-process global batch layout: shard_batch places
    # process 0's local batch on devices 0-3 and process 1's on 4-7, so
    # the global batch is the concatenation of the two per-host streams
    loaders = [ArrayLoader(x_all, y_all, global_batch // 2, train=True,
                           img_size=cfg.img_size, seed=11, pid=pid,
                           pcount=2) for pid in range(2)]
    for ld in loaders:
        ld.set_epoch(0)

    step_fn = build_stage1_step(cfg, table, hp, thp, warmup=False,
                                donate=False)
    state = create_train_state(params, thp, init_compression_state(cfg, hp))
    base_key = jax.random.PRNGKey(3)
    losses = []
    for i, (b0, b1) in enumerate(zip(*loaders)):
        if i >= steps:
            break
        x = np.concatenate([b0[0], b1[0]]).astype(np.float32)
        y = np.concatenate([b0[1], b1[1]])
        state, m = step_fn(state, teacher, x, y,
                           jax.random.fold_in(base_key, i),
                           jnp.asarray(-1.0))
        losses.append(float(m["loss"]))

    r0 = worker_results[0]
    np.testing.assert_allclose(losses, r0["losses"], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(state.cstate.s), r0["s"],
                               atol=1e-6)
    np.testing.assert_allclose(float(state.cstate.z), r0["z"], atol=1e-6)
    qkv = float(jnp.sum(jnp.abs(state.params["blocks"]["qkv"]["kernel"])))
    np.testing.assert_allclose(qkv, r0["qkv_sum"], rtol=2e-5)
