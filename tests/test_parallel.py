"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from uvc_tpu.configs import get_config
from uvc_tpu.compress.minimax import init_compression_state
from uvc_tpu.compress.resource import build_macs_table
from uvc_tpu.compress.state import MinimaxHParams
from uvc_tpu.models import vit
from uvc_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                   shard_params)
from uvc_tpu.train.state import TrainHParams, create_train_state
from uvc_tpu.train.step import build_stage1_step

CFG = get_config("testing")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(dp=4, mp=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_step_matches_single_device():
    """The same stage-1 step on a sharded batch must produce the same loss
    and identical (replicated) minimax state as the single-device run."""
    hp = MinimaxHParams(gating_interval=2, enable_patch_gating=0)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                       warmup_steps=2, mixup=0.0, cutmix=0.0,
                       compute_dtype=jnp.float32)
    table = build_macs_table(CFG)
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    teacher = vit.init_params(jax.random.PRNGKey(1), CFG)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (8, CFG.img_size, CFG.img_size, 3))
    y = jax.random.randint(key, (8,), 0, CFG.num_classes)

    step = build_stage1_step(CFG, table, hp, thp, warmup=False, donate=False)

    # single device
    state1 = create_train_state(params, thp, init_compression_state(CFG, hp))
    s1, m1 = step(state1, teacher, x, y, key, jnp.asarray(-1.0))

    # 8-device data parallel
    mesh = make_mesh()
    with mesh:
        statep = create_train_state(params, thp,
                                    init_compression_state(CFG, hp))
        statep = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), statep)
        teacherp = replicate(teacher, mesh)
        xp, yp = shard_batch((x, y), mesh)
        keyp = jax.device_put(key, NamedSharding(mesh, P()))
        s8, m8 = step(statep, teacherp, xp, yp, keyp, jnp.asarray(-1.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.cstate.s),
                               np.asarray(s8.cstate.s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.cstate.z),
                               np.asarray(s8.cstate.z), atol=1e-6)
    qk1 = np.asarray(s1.params["blocks"]["qkv"]["kernel"])
    qk8 = np.asarray(s8.params["blocks"]["qkv"]["kernel"])
    np.testing.assert_allclose(qk1, qk8, atol=2e-5)


def test_stage2_dp_step_matches_single_device():
    """Stage 2 is the reference's longest job (post_train.py:270-403):
    the mask-frozen distillation step on the 8-way data mesh must
    reproduce the single-device loss and weight update exactly."""
    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.train.step import build_stage2_step

    hp = MinimaxHParams(enable_patch_gating=0)
    thp = TrainHParams(num_classes=CFG.num_classes, t_total=100,
                       warmup_steps=2, mixup=0.0, cutmix=0.0,
                       compute_dtype=jnp.float32)
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    teacher = vit.init_params(jax.random.PRNGKey(1), CFG)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (8, CFG.img_size, CFG.img_size, 3))
    y = jax.random.randint(key, (8,), 0, CFG.num_classes)
    # non-trivial discovered architecture: prune 1 unit in layer 0's MLP
    s = jnp.zeros((CFG.depth, 2)).at[0, 1].set(1.0)
    masks = build_masks(params, s, jnp.zeros((CFG.depth, CFG.num_heads)),
                        CFG)

    step = build_stage2_step(CFG, hp, thp, donate=False)

    state1 = create_train_state(params, thp, None)
    s1, m1 = step(state1, teacher, masks, x, y, key)

    mesh = make_mesh()
    with mesh:
        statep = create_train_state(params, thp, None)
        statep = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), statep)
        teacherp = replicate(teacher, mesh)
        masksp = replicate(masks, mesh)
        xp, yp = shard_batch((x, y), mesh)
        keyp = jax.device_put(key, NamedSharding(mesh, P()))
        s8, m8 = step(statep, teacherp, masksp, xp, yp, keyp)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-5)
    qk1 = np.asarray(s1.params["blocks"]["qkv"]["kernel"])
    qk8 = np.asarray(s8.params["blocks"]["qkv"]["kernel"])
    np.testing.assert_allclose(qk1, qk8, atol=2e-5)
    # the frozen gating must not have moved on either path
    np.testing.assert_array_equal(np.asarray(s1.params["block_gating"]),
                                  np.asarray(params["block_gating"]))
    np.testing.assert_array_equal(np.asarray(s8.params["block_gating"]),
                                  np.asarray(params["block_gating"]))


def test_tensor_parallel_forward_matches():
    """TP-sharded forward must equal the replicated forward."""
    cfg = get_config("deit_tiny_patch16_224").replace(img_size=32,
                                                      depth=2)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    params["head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["kernel"].shape) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))

    def fwd(p, xb):
        return vit.apply(p, xb, cfg, train=False).logits

    ref = jax.jit(fwd)(params, x)

    mesh = make_mesh(dp=4, mp=2)
    with mesh:
        pp = shard_params(params, mesh, mp=2)
        xp, = (jax.device_put(x, NamedSharding(mesh, P("data"))),)
        out = jax.jit(fwd)(pp, xp)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_cli_joint_train_on_mesh(tmp_path):
    """The CLI engages the device mesh (regression: drivers previously
    never sharded, so multi-chip hosts ran single-device)."""
    from uvc_tpu.cli.joint_train import main
    main([
        "--model_type", "testing", "--dataset", "synthetic",
        "--img_size", "32", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--synthetic_steps", "2",
        "--num_epochs", "1", "--warmup_epochs", "0",
        "--post_num_epochs", "1", "--warmup_steps", "1",
        "--enable_patch_gating", "0", "--gating_interval", "2",
        "--mp", "2",
        "--output_dir", str(tmp_path), "--name", "mesh",
    ])
    assert (tmp_path / "mesh" / "metrics.jsonl").exists()


def test_ablation_params_shard_with_tp():
    """Regression: 'blocks' substring matched 'ablation_blocks', applying
    rank-3 TP specs to rank-2 ablation kernels."""
    from uvc_tpu.models import t2t_ablations
    cfg = get_config("t2t_vit_14_se").replace(
        img_size=64, embed_dim=32, depth=2, num_heads=2, token_dim=16,
        num_classes=5)
    params = t2t_ablations.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=4, mp=2)
    sharded = shard_params(params, mesh, mp=2)   # must not raise
    assert sharded["ablation_blocks"][0]["qkv"]["kernel"].shape == (32, 96)


def test_sharded_compact_serving_matches_single_device():
    """Serving scales over the data mesh too: apply_compact jitted with a
    dp-sharded batch must reproduce the single-device logits (the compact
    per-layer weights are replicated; XLA shards the batch dim)."""
    from uvc_tpu.compress.masks import build_masks
    from uvc_tpu.infer.compact import apply_compact, compact_model

    cfg = CFG.replace(embed_dim=16, num_heads=2, depth=3, num_classes=7)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    s = jnp.array([[1.0, 32.0], [0.0, 32.0], [0.0, 32.0]])
    masks = build_masks(params, s, jnp.zeros((3, 2)), cfg)
    params["block_gating"] = jnp.array(
        [[-1.0, 1.0], [-1.0, 1.0], [1.0, -1.0]])
    layers, top = compact_model(params, masks, cfg)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (16, cfg.img_size, cfg.img_size, 3))
    ref = apply_compact(layers, top, x, cfg, dtype=jnp.float32).logits

    mesh = make_mesh()                      # 8-way data mesh
    xs = jax.device_put(
        x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def serve(xb):
        return apply_compact(layers, top, xb, cfg,
                             dtype=jnp.float32).logits

    out = serve(xs)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
