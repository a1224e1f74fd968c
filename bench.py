"""Benchmark: stage-1 UVC train-step throughput + MFU, three backbones.

Prints ONE JSON line.  Headline metric = DeiT-Small stage-1 img/s per chip
(the round-over-round comparable); the same line carries `mfu` and a
`models` dict with DeiT-Base and T2T-ViT-14 rows so regressions off the
flagship are driver-visible.

Baseline derivation (BASELINE.md / SURVEY.md §6): the reference's only
wall-clock evidence is DeiT-Base stage-1 at ~36 img/s per GPU in the UVC
phase (log/deit-base-log.log, 512 img / 2.33 s/it warmup, ~146 img/s
whole-job on 4 GPUs).  Other models scale by the dense-forward FLOPs ratio
(DeiT-Small -> ~137 img/s per GPU, etc.).

MFU accounting: model FLOPs per image = 3x student forward (fwd + 2x for
backward) + 1x teacher forward — remat recomputation is NOT counted
(standard MFU convention).  Peak = 197 TFLOP/s bf16 (TPU v5e).  Forward
FLOPs come from the analytic MacsTable (dense, ungated — the stage-1
model's gating/token-selection overheads make this a slight undercount).
"""

import json
import os
import signal
import time

import jax
import jax.numpy as jnp

# persistent compile cache: most of a cold bench run is the relay's
# 20-100 s remote compiles; warm-cache reruns skip them entirely
# (measured 70.5 s -> 6.1 s per program).  /tmp persists across driver
# rounds on this machine.
from uvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(os.environ.get("UVC_COMPILE_CACHE",
                                        "/tmp/uvc_jaxcache"))


class _SectionTimeout(Exception):
    pass


def _raise_timeout(signum, frame):
    raise _SectionTimeout()


def _bounded(seconds, fn, *args, **kwargs):
    """Run a bench section with a watchdog: the TPU service occasionally
    wedges for ~1 h (every op hangs); a stuck secondary row must not cost
    the whole benchmark report."""
    old = signal.signal(signal.SIGALRM, _raise_timeout)
    signal.alarm(seconds)
    try:
        return fn(*args, **kwargs)
    except _SectionTimeout:
        return {"error": "timeout"}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)

REFERENCE_BASE_IMG_PER_SEC_PER_GPU = 36.0   # DeiT-Base UVC phase, per GPU
PEAK_FLOPS = 197e12                          # TPU v5e bf16


def bench_model(config_name, batch, steps, *, on_tpu):
    from uvc_tpu.configs import get_config
    from uvc_tpu.compress.minimax import init_compression_state
    from uvc_tpu.compress.resource import build_macs_table
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.models import get_model
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage1_step

    cfg = get_config(config_name)
    hp = MinimaxHParams(enable_patch_gating=2, gating_interval=100)
    thp = TrainHParams(num_classes=1000, t_total=10000, warmup_steps=500,
                      compute_dtype=jnp.bfloat16)
    table = build_macs_table(cfg)
    model = get_model(cfg)

    key = jax.random.PRNGKey(0)
    params = model.init_params(key, cfg)
    teacher = model.init_params(jax.random.PRNGKey(1), cfg)
    state = create_train_state(params, thp, init_compression_state(cfg, hp))
    # step bundling: scan `bundle` steps inside ONE program — per-launch
    # dispatch latency through remote/relayed TPU attachments is serial
    # and was measured anywhere from ~2 to ~36 ms depending on service
    # state, enough to distort a ~170 ms step by double-digit percent.
    # This is the drivers' OWN bundled program (build_stage1_step's
    # bundle= path) fed k DISTINCT stacked batches, so the headline pays
    # the same per-batch work the real training loop does (round-2 bench
    # closed over one batch — VERDICT r2 weak #5).  Batches are staged
    # bf16 on device once; host decode/H2D is pipelined (prefetched) in
    # the real drivers and excluded here.
    bundle = 10 if on_tpu else 1
    step = build_stage1_step(cfg, table, hp, thp, warmup=False,
                             donate=False, bundle=bundle)

    if bundle > 1:
        xs = jax.random.normal(
            key, (bundle, batch, cfg.img_size, cfg.img_size, 3),
            jnp.bfloat16)
        ys = jnp.zeros((bundle, batch), jnp.int32)
        taus = jnp.full((bundle,), 5.0, jnp.float32)
    else:
        xs = jax.random.normal(
            key, (batch, cfg.img_size, cfg.img_size, 3), jnp.float32)
        ys = jnp.zeros((batch,), jnp.int32)

    # warmup/compile; device_get (not block_until_ready) — only a D2H fetch
    # reliably drains the pipeline on remote-execution platforms
    def run_once(state, sub):
        if bundle > 1:
            state, m = step(state, teacher, xs, ys, taus, sub)
            float(jax.device_get(m["loss"].ravel()[-1]))
        else:
            state, m = step(state, teacher, xs, ys, sub, jnp.asarray(5.0))
            float(jax.device_get(m["loss"].ravel()[-1]))
        return state

    from uvc_tpu.models import vit as vit_mod
    from uvc_tpu.ops import performer as perf_mod
    # snapshot the kernel switches: a per-config fallback must not leak
    # into later configs in the same process (the flags are module
    # globals read at trace time) — each row reports its OWN state
    saved_flags = (vit_mod._FUSED_BLEND, vit_mod._FUSED_MLP,
                   vit_mod._FUSED_ATTN_LN, perf_mod._MERGED_DEFAULT)
    try:
        try:
            state = run_once(state, key)     # compile + warm
            fallback = None
        except Exception as e:               # noqa: BLE001
            # staged fallback: the fused kernels are interpret-tested but
            # compile on the real chip for the first time here.  Stage 1:
            # drop only the blend fusion (newest kernel).  Stage 2: fall
            # all the way back to the round-2-proven separate-LN kernels.
            # run_once reads `step` at call time, so rebinding suffices.
            import sys
            try:
                print(f"fused compile failed ({type(e).__name__}); "
                      f"retrying without the blend fusion", file=sys.stderr)
                vit_mod._FUSED_BLEND = False
                step = build_stage1_step(cfg, table, hp, thp, warmup=False,
                                         donate=False, bundle=bundle)
                state = create_train_state(
                    model.init_params(jax.random.PRNGKey(0), cfg), thp,
                    init_compression_state(cfg, hp))
                state = run_once(state, key)
                fallback = "blend"
            except Exception as e2:          # noqa: BLE001
                print(f"still failing ({type(e2).__name__}); falling back "
                      f"to round-2 kernels", file=sys.stderr)
                vit_mod._FUSED_MLP = False
                vit_mod._FUSED_ATTN_LN = False
                perf_mod._MERGED_DEFAULT = False
                step = build_stage1_step(cfg, table, hp, thp, warmup=False,
                                         donate=False, bundle=bundle)
                state = create_train_state(
                    model.init_params(jax.random.PRNGKey(0), cfg), thp,
                    init_compression_state(cfg, hp))
                state = run_once(state, key)
                fallback = "round2"
        t0 = time.perf_counter()
        for i in range(steps // bundle):
            key, sub = jax.random.split(key)
            state = run_once(state, sub)
        dt = time.perf_counter() - t0
    finally:
        (vit_mod._FUSED_BLEND, vit_mod._FUSED_MLP,
         vit_mod._FUSED_ATTN_LN, perf_mod._MERGED_DEFAULT) = saved_flags
    steps = (steps // bundle) * bundle

    img_per_sec = batch * steps / dt
    fwd_flops = float(table.dense_flops)           # FLOPs per image, fwd
    step_flops_per_img = 4.0 * fwd_flops           # 3x student + 1x teacher
    mfu = img_per_sec * step_flops_per_img / PEAK_FLOPS
    baseline = REFERENCE_BASE_IMG_PER_SEC_PER_GPU * 35126.12e6 / fwd_flops
    out = {
        "img_per_sec": round(img_per_sec, 2),
        "vs_baseline": round(img_per_sec / baseline, 3),
        "mfu": round(mfu, 4),
    }
    if fallback:
        # the stage string distinguishes "lost only the blend fusion"
        # from "lost the whole round-3 kernel stack" (stays truthy for
        # existing consumers)
        out["kernel_fallback"] = fallback
    return out


def bench_serving(on_tpu):
    """Compact-serving vs masked-dense inference at a discovered
    architecture: half the heads, half the MLP units, token selection at
    ratio 0.7 (the baseline suite's token-selection rate).  The reference
    serves masked weights at dense cost (post_train.py:357-360);
    infer/compact.py physically slices the architecture AND drops the
    unselected tokens (static per-image top-k from the trained scorer).
    Both sides run the same arch: dense applies masks + the deterministic
    token mask, compact computes only the kept shapes.  `logit_rel_err`
    records the serving-vs-masked-dense logit drift from dropping the
    positional ghost tokens (see apply_compact)."""
    import numpy as np

    from uvc_tpu.configs import get_config
    from uvc_tpu.infer.compact import apply_compact, compact_model
    from uvc_tpu.models import vit

    cfg = get_config("deit_small_patch16_224")
    token_ratio = 0.7
    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    # head is zero-init (ViT convention) — randomize so the logit-drift
    # figure is not 0/0
    params["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["kernel"].shape)
    ln, d, f = cfg.depth, cfg.embed_dim, cfg.mlp_hidden
    attn = np.zeros((ln, d), np.float32)
    attn[:, :d // 2] = 1.0                      # keep 3 of 6 heads
    mlp = np.zeros((ln, f), np.float32)
    mlp[:, :f // 2] = 1.0                       # keep half the MLP units
    masks = {"attn": jnp.asarray(attn), "mlp": jnp.asarray(mlp)}
    layers, top = compact_model(params, masks, cfg,
                                block_keep=np.ones(ln, bool))
    batch = 256 if on_tpu else 8
    reps = 10 if on_tpu else 2
    x = jax.random.normal(key, (batch, cfg.img_size, cfg.img_size, 3),
                          jnp.float32)

    def scan_of(fn):
        def run(x):
            def body(c, _):
                return c + jnp.sum(fn(x * (1 + 1e-6 * c))), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return c
        return jax.jit(run)

    def compact_logits(xb):
        return apply_compact(layers, top, xb, cfg,
                             token_ratio=token_ratio
                             ).logits.astype(jnp.float32)

    def dense_logits(xb):
        return vit.apply(params, xb, cfg, masks=masks,
                         patch_gate_mode=2, patch_ratio=token_ratio,
                         rng=None, train=False,
                         dtype=jnp.bfloat16).logits.astype(jnp.float32)

    compact_fn = scan_of(compact_logits)
    dense_fn = scan_of(dense_logits)

    # interleaved best-of-N timing: relay dispatch latency drifts by tens
    # of ms over minutes; a drift window that lands on one side's timing
    # block would skew the ratio (an r3 run recorded compact at 2.76x its
    # true cost while dense, timed a minute later, was unaffected).
    # Interleaving exposes both sides to the same service state and the
    # min discards slow outliers (noise on this path only ever adds time).
    pairs = (("compact", compact_fn), ("masked_dense", dense_fn))
    for _, fn in pairs:
        float(jax.device_get(fn(x)))            # compile + warm
    times = {name: [] for name, _ in pairs}
    for _ in range(5):
        for name, fn in pairs:
            t0 = time.perf_counter()
            float(jax.device_get(fn(x)))
            times[name].append(time.perf_counter() - t0)
    out = {name: round(batch * reps / min(ts), 1)
           for name, ts in times.items()}
    out["speedup"] = round(out["compact"] / out["masked_dense"], 3)
    out["token_ratio"] = token_ratio
    lc, ld = (np.asarray(jax.device_get(jax.jit(f)(x[:16])))
              for f in (compact_logits, dense_logits))
    out["logit_rel_err"] = round(
        float(np.linalg.norm(lc - ld) / np.linalg.norm(ld)), 4)
    return out


def main():
    # the TPU may surface under a plugin platform name (e.g. "axon"), so
    # detect "accelerator" as anything that is not host CPU
    on_tpu = jax.devices()[0].platform != "cpu"

    small = bench_model("deit_small_patch16_224",
                        256 if on_tpu else 16, 30 if on_tpu else 3,
                        on_tpu=on_tpu)
    models = {}
    serving = {}
    if on_tpu:   # secondary rows: regression visibility off the flagship
        models["deit_tiny_patch16_224"] = _bounded(
            420, bench_model, "deit_tiny_patch16_224", 512, 20,
            on_tpu=on_tpu)
        if isinstance(models["deit_tiny_patch16_224"], dict):
            # Tiny's ~23% MFU is STRUCTURAL, not a kernel bug: dh=64
            # per-head matmuls halve MXU K/N utilization, and deleting
            # the entire softmax changes wall time < 8% at every width
            # (ATTNFWD_r04.json, scripts/tpu_attn_fwd_lab.py; packing/
            # fold variants measured out there too)
            models["deit_tiny_patch16_224"]["note"] = (
                "low MFU structural (dh=64 matmul granularity; "
                "ATTNFWD_r04)")
        models["deit_base_patch16_224"] = _bounded(
            420, bench_model, "deit_base_patch16_224", 128, 10,
            on_tpu=on_tpu)
        models["t2t_vit_14"] = _bounded(
            560, bench_model, "t2t_vit_14", 256, 10, on_tpu=on_tpu)
        serving = _bounded(420, bench_serving, on_tpu)

    report = {
        "metric": "deit_small_stage1_uvc_train_throughput_per_chip",
        "value": small["img_per_sec"],
        "unit": "img/s",
        "vs_baseline": small["vs_baseline"],
        "mfu": small["mfu"],
        "models": models,
        "serving": serving,
    }
    # headline fallback must be visible at the top level — the driver
    # compares `value` round-over-round and needs to see when the number
    # was produced by a degraded kernel stack (VERDICT r3 weak #3)
    if small.get("kernel_fallback"):
        report["kernel_fallback"] = small["kernel_fallback"]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
