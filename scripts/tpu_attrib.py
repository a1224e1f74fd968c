"""On-chip cost attribution for the stage-1 step.

Times variants of the stage-1 program to attribute the step's wall time:

  full        the bench headline program (mixup + student fwd/bwd + teacher
              fwd + clip/AdamW + arch update), bundled k=10
  noarch      full minus the minimax arch update
  nomixup     full minus mixup (one-hot targets)
  noteacher   full minus the teacher forward (alpha=0 hard CE-vs-self)
  fwdonly     loss value only (no grad): student fwd + teacher fwd
  encoder     just the remat'd encoder fwd+bwd (no embed/heads/loss/opt)

Usage:  timeout 1800 python scripts/tpu_attrib.py small [tiny] [base]
        UVC_ATTRIB_ROWS=encoder_fb,teacher_fwd ... # row subset (the
        fwdonly program hangs in XLA compile through the relay — run it
        alone with a hard timeout if needed)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(os.environ.get("UVC_COMPILE_CACHE",
                                        "/tmp/uvc_jaxcache"))

MODELS = {
    "tiny": ("deit_tiny_patch16_224", 512),
    "small": ("deit_small_patch16_224", 256),
    "base": ("deit_base_patch16_224", 128),
    "t2t": ("t2t_vit_14", 256),
}

BUNDLE = 10


def _drain(x):
    float(jax.device_get(jnp.sum(x).astype(jnp.float32)))


def _time(fn, *args, reps=2):
    out = fn(*args)
    _drain(jax.tree.leaves(out)[0])          # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _drain(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def attrib(name):
    from uvc_tpu.configs import get_config
    from uvc_tpu.compress.minimax import init_compression_state
    from uvc_tpu.compress.resource import build_macs_table
    from uvc_tpu.compress.state import MinimaxHParams
    from uvc_tpu.models import get_model, vit
    from uvc_tpu.train.state import TrainHParams, create_train_state
    from uvc_tpu.train.step import build_stage1_step

    config_name, batch = MODELS[name]
    cfg = get_config(config_name)
    table = build_macs_table(cfg)
    model = get_model(cfg)
    thp = TrainHParams(num_classes=cfg.num_classes, t_total=10000,
                       warmup_steps=500, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key, cfg)
    teacher = model.init_params(jax.random.PRNGKey(1), cfg)

    xs = jax.random.normal(
        key, (BUNDLE, batch, cfg.img_size, cfg.img_size, 3), jnp.bfloat16)
    ys = jnp.zeros((BUNDLE, batch), jnp.int32)
    taus = jnp.full((BUNDLE,), 5.0, jnp.float32)

    want = os.environ.get("UVC_ATTRIB_ROWS")
    want = set(want.split(",")) if want else None

    def _skip(k):
        return want is not None and k not in want

    rows = {}

    def _row(k, v):
        # per-row flushed progress: a killed run keeps its partial rows
        rows[k] = v
        print(f"  [{name}] {k:16s} {v / BUNDLE * 1e3:8.2f} ms/step",
              flush=True)

    def bench_step(hp, thp_):
        state = create_train_state(
            jax.tree.map(jnp.copy, params), thp_,
            init_compression_state(cfg, hp))
        step = build_stage1_step(cfg, table, hp, thp_, warmup=False,
                                 donate=False, bundle=BUNDLE)
        def run():
            st, m = step(state, teacher, xs, ys, taus, key)
            return m["loss"]
        return _time(lambda: run())

    hp = MinimaxHParams(enable_patch_gating=2, gating_interval=100)
    if not _skip("full"):
        _row("full", bench_step(hp, thp))

    # no arch update: gating/pruning all off => arch_update degenerates
    hp_noarch = MinimaxHParams(enable_patch_gating=0, enable_block_gating=False,
                               enable_pruning=False, gating_interval=100)
    if not _skip("noarch_nogate"):
        _row("noarch_nogate", bench_step(hp_noarch, thp))

    # splits of the arch+gate delta:
    #   full - nopatch  = token-selection fwd/bwd (scorer + gumbel top-k)
    #   full - noprune  = prox + scores + s/r primal/dual machinery
    hp_nopatch = MinimaxHParams(enable_patch_gating=0, gating_interval=100)
    if not _skip("nopatch"):
        _row("nopatch", bench_step(hp_nopatch, thp))
    hp_noprune = MinimaxHParams(enable_patch_gating=2, enable_pruning=False,
                                gating_interval=100)
    if not _skip("noprune"):
        _row("noprune", bench_step(hp_noprune, thp))

    import dataclasses
    thp_nomix = dataclasses.replace(thp, mixup=0.0, cutmix=0.0)
    if not _skip("nomixup"):
        _row("nomixup", bench_step(hp, thp_nomix))

    thp_noteach = dataclasses.replace(thp, distillation_alpha=0.0,
                                      distillation_type="none")
    if not _skip("noteacher"):
        _row("noteacher", bench_step(hp, thp_noteach))

    # fwd-only (student+teacher, mixup, no grad/opt/arch)
    from uvc_tpu.ops.gumbel import block_gating_distrib
    from uvc_tpu.data.mixup import mixup_cutmix
    from uvc_tpu.distill.losses import (distillation_loss,
                                        soft_target_cross_entropy)
    cstate = init_compression_state(cfg, hp)

    def fwd_one(x, labels, tau, k):
        k_mix, k_gate, k_tok = jax.random.split(k, 3)
        x, targets = mixup_cutmix(k_mix, x, labels,
                                  num_classes=cfg.num_classes,
                                  mixup_alpha=thp.mixup,
                                  cutmix_alpha=thp.cutmix,
                                  prob=thp.mixup_prob,
                                  switch_prob=thp.mixup_switch_prob,
                                  smoothing=thp.smoothing,
                                  mode=thp.mixup_mode,
                                  cutmix_minmax=thp.cutmix_minmax)
        gd = block_gating_distrib(k_gate, params["block_gating"],
                                  use_gumbel=True, gumbel_hard=False,
                                  eps=cstate.eps, warmup=False)
        out = model.apply(params, x, cfg, gating_distrib=gd, tau=tau,
                          patch_ratio=hp.patch_ratio, patch_gate_mode=2,
                          rng=k_tok, train=True, dtype=jnp.bfloat16)
        base = soft_target_cross_entropy(out.logits, targets)
        t_out = model.apply(teacher, x, cfg, dtype=jnp.bfloat16, train=False)
        t_logits = model.eval_logits(t_out, cfg)
        return distillation_loss(base, out.logits_kd, t_logits, kind="soft",
                                 alpha=0.5, tau=1.0)

    @jax.jit
    def fwd_bundle(k):
        def body(c, i):
            return c + fwd_one(xs[i], ys[i], taus[i],
                               jax.random.fold_in(k, i)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(BUNDLE))
        return c
    if not _skip("fwdonly"):
        _row("fwdonly", _time(fwd_bundle, key))

    # encoder-only fwd+bwd: the gated remat'd block stack
    # NOTE these two rows are single-dispatch programs (no k-bundle): a
    # fori_loop/scan wrapped around a bare model.apply hangs in XLA
    # compile through the relay (observed twice, >12 min; the drivers'
    # bundled STEP compiles fine).  ~2 ms dispatch noise on a 40-70 ms
    # program is acceptable for attribution.
    @jax.jit
    def enc_fb(z):
        def loss(p):
            h = vit.transformer_encode(p, z, cfg, dtype=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))
        g = jax.grad(loss)(params)
        # consume EVERY grad leaf: reducing only one leaf lets XLA
        # DCE the whole backward (measured 24.8 ms vs the real number)
        return sum(jnp.sum(t.astype(jnp.float32))
                   for t in jax.tree.leaves(g))
    if not _skip("encoder_fb"):
        seq1 = 0.02 * jax.random.normal(
            key, (batch, cfg.seq_len, cfg.embed_dim), jnp.bfloat16)
        _row("encoder_fb",
             BUNDLE * _time(enc_fb, seq1, reps=10))

    # teacher-style dense fwd alone
    @jax.jit
    def teach_fwd(x1):
        out = model.apply(teacher, x1, cfg, dtype=jnp.bfloat16,
                          train=False)
        return jnp.sum(out.logits.astype(jnp.float32))
    if not _skip("teacher_fwd"):
        _row("teacher_fwd", BUNDLE * _time(teach_fwd, xs[0], reps=10))

    per_step = {k: v / BUNDLE * 1e3 for k, v in rows.items()}
    print(f"== {name} (B={batch}, bundle={BUNDLE}) ms/step ==", flush=True)
    for k, v in per_step.items():
        print(f"  {k:16s} {v:8.2f} ms   ({batch / (v / 1e3):7.0f} img/s)",
              flush=True)
    if {"full", "noarch_nogate", "nomixup", "noteacher"} <= rows.keys():
        full = per_step["full"]
        deltas = (f"  deltas: arch+gate={full - per_step['noarch_nogate']:.2f}"
                  f"  mixup={full - per_step['nomixup']:.2f}"
                  f"  teacher_in_step={full - per_step['noteacher']:.2f}")
        if "nopatch" in per_step:
            deltas += f"  tokensel={full - per_step['nopatch']:.2f}"
        if "noprune" in per_step:
            deltas += f"  prune_update={full - per_step['noprune']:.2f}"
        if "fwdonly" in per_step:
            deltas += f"  bwd+opt={full - per_step['fwdonly']:.2f}"
        print(deltas)
    return per_step


if __name__ == "__main__":
    import argparse
    import json
    import time as _time_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=["small"])
    ap.add_argument("--out", default=None,
                    help="write the JSON artifact here (ATTRIB_r<N>.json)")
    opts = ap.parse_args()
    t0 = _time_mod.time()
    all_rows = {}
    for n in (opts.models or ["small"]):
        all_rows[n] = {k: round(v, 2) for k, v in attrib(n).items()}
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump({
                "harness": "tpu_attrib",
                "platform": jax.devices()[0].platform,
                "bundle": BUNDLE,
                "unit": "ms_per_step",
                "batches": {k: MODELS[k][1] for k in all_rows},
                "note": ("only in-program DELTAS are trustworthy: "
                         "standalone rows (encoder_fb, teacher_fwd) are "
                         "inflated by pipeline bubbles vs in-situ"),
                "wall_s": round(_time_mod.time() - t0, 1),
                "models": all_rows,
            }, fh, indent=1)
        print(f"wrote {opts.out}")
