"""Benchmark: stage-1 UVC train-step throughput on DeiT-Small.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md / SURVEY.md §6): the reference's only
wall-clock evidence is DeiT-Base stage-1 at 512 img / 2.33 s/it in warmup
(~220 img/s whole-job) and ~146 img/s in the UVC phase on the training
cluster (log/deit-base-log.log), i.e. ~36 img/s per GPU at 17.6 GFLOPs.
Scaling by the FLOPs ratio to DeiT-Small (4.6 GFLOPs) gives ~140 img/s per
GPU for the UVC phase.  vs_baseline reports our per-chip img/s divided by
that 140 img/s per-device estimate.
"""

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC_PER_DEVICE = 140.0


def main():
    from uvc_tpu.configs import get_config
    from uvc_tpu.compress.minimax import init_compression_state
    from uvc_tpu.compress.resource import build_macs_table
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.models import vit
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage1_step

    cfg = get_config("deit_small_patch16_224")
    hp = MinimaxHParams(enable_patch_gating=2, gating_interval=100)
    # the TPU may surface under a plugin platform name (e.g. "axon"), so
    # detect "accelerator" as anything that is not host CPU
    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 256 if on_tpu else 16
    steps = 30 if on_tpu else 3
    thp = TrainHParams(num_classes=1000, t_total=10000, warmup_steps=500,
                       compute_dtype=jnp.bfloat16)
    table = build_macs_table(cfg)

    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    teacher = vit.init_params(jax.random.PRNGKey(1), cfg)
    state = create_train_state(params, thp, init_compression_state(cfg, hp))
    step = build_stage1_step(cfg, table, hp, thp, warmup=False)

    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)

    # warmup/compile; device_get (not block_until_ready) — only a D2H fetch
    # reliably drains the pipeline on remote-execution platforms
    state, m = step(state, teacher, x, y, key, jnp.asarray(5.0))
    float(jax.device_get(m["loss"]))

    # drain every few steps: mirrors real training (host reads metrics
    # periodically) and avoids pathological deep async dispatch queues on
    # relayed platforms
    drain_every = 5
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, teacher, x, y, sub, jnp.asarray(5.0))
        if (i + 1) % drain_every == 0:
            float(jax.device_get(m["loss"]))
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    img_per_sec = batch * steps / dt

    print(json.dumps({
        "metric": "deit_small_stage1_uvc_train_throughput_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC_PER_DEVICE,
                             3),
    }))


if __name__ == "__main__":
    main()
