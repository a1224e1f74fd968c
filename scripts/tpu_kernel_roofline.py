"""Per-kernel achieved-FLOPs roofline for the fused sublayer kernels.

Times each hot Pallas program in isolation (scanned k times inside one
jitted program so the ~2 ms relay dispatch floor is amortized) and prints
achieved TFLOP/s vs the 197 TFLOP/s v5e bf16 peak, plus an MXU-tile-
adjusted ceiling that accounts for lane/sublane padding of the model's
actual shapes (e.g. head_dim 64 halves the qk/av contraction efficiency).

Rows per model:
  attn_fwd   LN1 + qkv + attention + mask + proj + residual (one program)
  attn_bwd   the whole-sublayer VJP program
  mlp_fwd    LN2 + fc1 + GELU + mask + fc2 + residual
  mlp_bwd    its VJP program
  block_fb   both sublayers fwd+bwd through the real remat'd scan body

Usage: timeout 1800 python scripts/tpu_kernel_roofline.py small [tiny ...]
           [--out ROOFLINE_rN.json]

NOTE (CLAUDE.md): isolated scanned-kernel timings are ~1.7x pessimistic vs
in-situ (pipeline bubbles between identical back-to-back programs) — the
"% of tile-ceiling" column is a lower bound; use rows for A/B deltas and
ceiling-ratio ordering, not absolute step predictions.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

MODELS = {
    "tiny": ("deit_tiny_patch16_224", 512),
    "small": ("deit_small_patch16_224", 256),
    "base": ("deit_base_patch16_224", 128),
}

PEAK = 197e12
REPS = 30


def _drain(x):
    float(jax.device_get(jnp.sum(x).astype(jnp.float32)))


def _time_scan(fn, x, reps=REPS):
    """Scan fn reps times inside one program; returns seconds per call."""

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    out = run(x)
    _drain(out)                       # compile + warm
    best = float("inf")
    for _ in range(5):                # min-of-5: the relay's dispatch
        t0 = time.perf_counter()      # latency drifts by tens of ms
        out = run(x)
        _drain(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def _eff(k, n):
    """MXU tile efficiency of a [m, k] @ [k, n] matmul: K and N pad to 128
    lanes (m, the sublane dim, is large here and pads to 8s — ~free)."""
    pad = lambda v: -(-v // 128) * 128
    return (k / pad(k)) * (n / pad(n))


def roofline(name):
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit

    config_name, b = MODELS[name]
    cfg = get_config(config_name)
    d, f, h = cfg.embed_dim, cfg.mlp_hidden, cfg.num_heads
    dh = d // h
    n = cfg.seq_len
    np_ = -(-n // 16) * 16            # _pad_rows
    scale = dh ** -0.5
    eps = cfg.layer_norm_eps

    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    blk0 = jax.tree.map(lambda t: t[0], params["blocks"])
    x = 0.1 * jax.random.normal(key, (b, n, d), jnp.bfloat16)
    ones_d = jnp.ones((d,), jnp.bfloat16)
    ones_f = jnp.ones((f,), jnp.bfloat16)

    # FLOPs per call (2*MACs), full batch
    attn_mm = b * n * (3 * d * d + d * d) * 2          # qkv + proj
    attn_core = b * h * n * n * dh * 2 * 2             # qk^T + av
    mlp_mm = b * n * (d * f * 2) * 2                   # fc1 + fc2
    # tile-adjusted ceilings (weighted by each matmul's share)
    attn_fl = attn_mm + attn_core
    attn_ceiling = attn_fl / (
        (b * n * 3 * d * d * 2) / _eff(d, 3 * d)
        + (b * h * n * n * dh * 2) / _eff(dh, np_)
        + (b * h * n * n * dh * 2) / _eff(np_, dh)
        + (b * n * d * d * 2) / _eff(d, d)) * PEAK
    mlp_ceiling = mlp_mm / (
        (b * n * d * f * 2) / _eff(d, f)
        + (b * n * d * f * 2) / _eff(f, d)) * PEAK

    def attn(z):
        return vit._attention_ln(z, blk0, h, scale, ones_d, eps,
                                 jnp.bfloat16)

    def mlp(z):
        return vit._mlp_ln(z, blk0, ones_f, eps, jnp.bfloat16)

    def grad_of(fn):
        g = jax.grad(lambda z: jnp.sum(fn(z).astype(jnp.float32)))
        return lambda z: 0.1 * jax.nn.tanh(g(z))       # keep scan stable

    rows = [
        ("attn_fwd", attn, attn_fl, attn_ceiling),
        # bwd ~= 2x fwd matmul FLOPs (+ fwd recompute inside the kernel)
        ("attn_f+b", grad_of(attn), 3 * attn_fl, attn_ceiling),
        ("mlp_fwd", mlp, mlp_mm, mlp_ceiling),
        ("mlp_f+b", grad_of(mlp), 3 * mlp_mm, mlp_ceiling),
    ]
    print(f"== {name} B={b} d={d} f={f} heads={h} N={n}->{np_} "
          f"(ceilings: attn {attn_ceiling/1e12:.0f}, "
          f"mlp {mlp_ceiling/1e12:.0f} TF/s)", flush=True)
    result = {
        "model": name, "batch": b, "embed_dim": d, "mlp_hidden": f,
        "heads": h, "seq": n, "seq_padded": np_,
        "attn_tile_ceiling_tfs": round(attn_ceiling / 1e12, 1),
        "mlp_tile_ceiling_tfs": round(mlp_ceiling / 1e12, 1),
        "rows": [],
    }
    for label, fn, flops, ceil in rows:
        dt = _time_scan(fn, x)
        tf = flops / dt / 1e12
        print(f"  {label:9s} {dt*1e3:7.3f} ms  {tf:6.1f} TF/s  "
              f"{tf/ (PEAK/1e12) * 100:5.1f}% peak  "
              f"{tf / (ceil/1e12) * 100:5.1f}% of tile-ceiling", flush=True)
        result["rows"].append({
            "kernel": label, "ms": round(dt * 1e3, 3),
            "tflops_s": round(tf, 1),
            "pct_peak": round(tf / (PEAK / 1e12) * 100, 1),
            "pct_tile_ceiling": round(tf / (ceil / 1e12) * 100, 1),
        })
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=["small"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    t0 = time.time()
    results = [roofline(m) for m in (args.models or ["small"])]
    if args.out:
        payload = {
            "harness": "tpu_kernel_roofline",
            "platform": jax.devices()[0].platform,
            "peak_bf16_tfs": PEAK / 1e12,
            "reps_per_timing": REPS,
            "note": ("isolated scanned-kernel timings are ~1.7x pessimistic "
                     "vs in-situ; use for deltas/ceiling ratios, not "
                     "absolute step predictions"),
            "wall_s": round(time.time() - t0, 1),
            "models": results,
        }
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {args.out}", flush=True)
