"""TPU kernel parity harness: fused Pallas paths vs composed XLA oracle.

Runs ON the accelerator (no interpret mode) and asserts, at real model
shapes (DeiT-Tiny / Small / Base, T2T-14), that

  1. the fused attention-sublayer forward (ops/attention.py
     fused_layer_attention) matches qkv-matmul -> naive attention ->
     mask -> proj-matmul,
  2. its VJP (the fully-fused sublayer backward kernel, or the composed
     fallback for widths whose accumulators overflow VMEM) matches
     autodiff through the composed path,
  3. the LN-fused residual sublayer (fused_layer_attention_ln: LN1 +
     sublayer + residual in one program each way) matches the composed
     LN -> sublayer -> add, fwd and all eight grads, and
  4. the fused T2T performer stage matches its composed form,

to bf16-appropriate tolerances.  Results are written as a JSON artifact
(--out, e.g. KPARITY_r03.json) so every round records machine-checkable
evidence (VERDICT r2 missing #2 / weak #4).

Usage:  timeout 900 python scripts/tpu_kernel_parity.py --out KPARITY_r03.json

Exits non-zero on any mismatch; prints one PASS line per (model, check).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.ops.attention import (_head_group_split, _layer_ln_bwd_group,
                                   _pad_rows, fused_layer_attention,
                                   fused_layer_attention_ln,
                                   reference_attention)

# (name, batch, tokens, width, heads) — tokens = 196 patches + cls + dist
SHAPES = [
    ("deit_tiny", 64, 198, 192, 3),
    ("deit_small", 64, 198, 384, 6),
    ("deit_base", 32, 198, 768, 12),
    ("t2t_14", 64, 197, 384, 6),
]

ROWS = []


def record(model, check, e, tol):
    ok = e < tol
    ROWS.append({"model": model, "check": check,
                 "rel_err": round(e, 5), "tol": tol, "pass": bool(ok)})
    print(f"{model:12s} {check:24s} rel_err={e:.4f} "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def composed(x, wqkv, bqkv, wproj, bproj, mask, heads, scale):
    b, n, d = x.shape
    dh = d // heads
    qkv = (x @ wqkv + bqkv).reshape(b, n, 3, heads, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ctx = reference_attention(q, k, v, scale)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d) * mask
    return ctx @ wproj + bproj


def composed_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, heads, scale,
                eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    a_in = ((x32 - mean) * jax.lax.rsqrt(var + eps) * g1 + b1) \
        .astype(x.dtype)
    return x + composed(a_in, wqkv, bqkv, wproj, bproj, mask, heads, scale)


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8))


def make_inputs(b, n, d, ln=False):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, n, d), dt)
    wqkv = (jax.random.normal(ks[1], (d, 3 * d), dt) * 0.05)
    bqkv = (jax.random.normal(ks[2], (3 * d,), dt) * 0.05)
    wproj = (jax.random.normal(ks[3], (d, d), dt) * 0.05)
    bproj = (jax.random.normal(ks[4], (d,), dt) * 0.05)
    mask = (jax.random.uniform(ks[5], (d,)) > 0.25).astype(dt)
    if not ln:
        return (x, wqkv, bqkv, wproj, bproj, mask)
    g1 = 1.0 + 0.1 * jax.random.normal(ks[6], (d,))
    b1 = 0.1 * jax.random.normal(ks[7], (d,))
    return (x, g1, b1, wqkv, bqkv, wproj, bproj, mask)


def check(name, b, n, d, heads, tol=2e-2):
    scale = (d // heads) ** -0.5
    args = make_inputs(b, n, d)

    fused = jax.jit(lambda *a: fused_layer_attention(
        *a, num_heads=heads, scale=scale))
    oracle = jax.jit(lambda *a: composed(*a, heads, scale))
    of, oo = jax.device_get(fused(*args)), jax.device_get(oracle(*args))
    all_ok = record(name, "fwd", rel_err(of, oo), tol)
    ng, _ = _head_group_split(b, d, heads, _pad_rows(n))
    bwd_kind = ("composed-bwd" if ng is None else
                "fused-bwd" if ng == 1 else f"fused-bwd-x{ng}")

    def loss_f(*a):
        return jnp.sum(fused_layer_attention(
            *a, num_heads=heads, scale=scale).astype(jnp.float32) ** 2)

    def loss_o(*a):
        return jnp.sum(composed(*a, heads, scale).astype(jnp.float32) ** 2)

    gf = jax.device_get(jax.jit(jax.grad(loss_f, argnums=tuple(range(6))))(
        *args))
    go = jax.device_get(jax.jit(jax.grad(loss_o, argnums=tuple(range(6))))(
        *args))
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dmask"]
    for nm, a_, b_ in zip(names, gf, go):
        # bwd tolerance is looser: the oracle's grads accumulate in a
        # different order (XLA batched matmuls) than the kernel's
        # sequential-grid f32 accumulators
        all_ok &= record(name, f"{bwd_kind} {nm}", rel_err(a_, b_), 3 * tol)
    return all_ok


def check_ln(name, b, n, d, heads, tol=2e-2):
    scale = (d // heads) ** -0.5
    args = make_inputs(b, n, d, ln=True)
    bwd_kind = ("ln-fused-bwd"
                if _layer_ln_bwd_group(b, d, _pad_rows(n)) is not None
                else "ln-peel-bwd")

    fused = jax.jit(lambda *a: fused_layer_attention_ln(
        *a, num_heads=heads, scale=scale, eps=1e-6))
    oracle = jax.jit(lambda *a: composed_ln(*a, heads, scale))
    of, oo = jax.device_get(fused(*args)), jax.device_get(oracle(*args))
    all_ok = record(name, "ln fwd", rel_err(of, oo), tol)

    def loss_f(*a):
        return jnp.sum(fused_layer_attention_ln(
            *a, num_heads=heads, scale=scale,
            eps=1e-6).astype(jnp.float32) ** 2)

    def loss_o(*a):
        return jnp.sum(composed_ln(*a, heads, scale).astype(jnp.float32) ** 2)

    gf = jax.device_get(jax.jit(jax.grad(loss_f, argnums=tuple(range(8))))(
        *args))
    go = jax.device_get(jax.jit(jax.grad(loss_o, argnums=tuple(range(8))))(
        *args))
    names = ["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwproj", "dbproj",
             "dmask"]
    for nm, a_, b_ in zip(names, gf, go):
        all_ok &= record(name, f"{bwd_kind} {nm}", rel_err(a_, b_), 3 * tol)
    return all_ok


def check_ln_rect(name, b, n, d, da, heads, tol=2e-2):
    """Rectangular widths (attention width da < model width d): the
    compact stage-2 training layers (train/compact_ft.py).  The LN-fused
    sublayer forward AND its single-program backward must match autodiff
    through the rectangular composition on-chip."""
    scale = (da // heads) ** -0.5
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, n, d), dt)
    g1 = 1.0 + 0.1 * jax.random.normal(ks[6], (d,))
    b1 = 0.1 * jax.random.normal(ks[7], (d,))
    wqkv = jax.random.normal(ks[1], (d, 3 * da), dt) * 0.05
    bqkv = jax.random.normal(ks[2], (3 * da,), dt) * 0.05
    wproj = jax.random.normal(ks[3], (da, d), dt) * 0.05
    bproj = jax.random.normal(ks[4], (d,), dt) * 0.05
    mask = (jax.random.uniform(ks[5], (da,)) > 0.25).astype(dt)
    args = (x, g1, b1, wqkv, bqkv, wproj, bproj, mask)

    def composed_rect(x, g1, b1, wqkv, bqkv, wproj, bproj, mask):
        dh = da // heads
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        a_in = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * g1 + b1) \
            .astype(x.dtype)
        qkv = (a_in @ wqkv + bqkv).reshape(b, n, 3, heads, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        ctx = reference_attention(q, k, v, scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, da) * mask
        return x + ctx @ wproj + bproj

    bwd_kind = ("ln-fused-rect-bwd"
                if _layer_ln_bwd_group(b, d, _pad_rows(n), da) is not None
                else "ln-peel-rect-bwd")
    fused = jax.jit(lambda *a: fused_layer_attention_ln(
        *a, num_heads=heads, scale=scale, eps=1e-6))
    oracle = jax.jit(composed_rect)
    of, oo = jax.device_get(fused(*args)), jax.device_get(oracle(*args))
    all_ok = record(name, "ln-rect fwd", rel_err(of, oo), tol)

    def loss_f(*a):
        return jnp.sum(fused_layer_attention_ln(
            *a, num_heads=heads, scale=scale,
            eps=1e-6).astype(jnp.float32) ** 2)

    def loss_o(*a):
        return jnp.sum(composed_rect(*a).astype(jnp.float32) ** 2)

    gf = jax.device_get(jax.jit(jax.grad(loss_f, argnums=tuple(range(8))))(
        *args))
    go = jax.device_get(jax.jit(jax.grad(loss_o, argnums=tuple(range(8))))(
        *args))
    names = ["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwproj", "dbproj",
             "dmask"]
    for nm, a_, b_ in zip(names, gf, go):
        all_ok &= record(name, f"{bwd_kind} {nm}", rel_err(a_, b_), 3 * tol)
    return all_ok


def check_blend(name, b, n, d, f, tol=2e-2):
    """Blend-fused MLP sublayer (ops/mlp.py fused_mlp_ln_blend: LN2 + fc1
    + GELU + mask + fc2 + residual + block-gating blend, with the gating
    grads dd0/dd1 rebuilt in-kernel) vs the XLA composition, on-chip."""
    from uvc_tpu.ops.mlp import (_composed_mlp_ln_blend,
                                 _mlp_blend_bwd_group, fused_mlp_ln_blend)
    ks = jax.random.split(jax.random.PRNGKey(5), 10)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, n, d), dt)
    xin = jax.random.normal(ks[1], (b, n, d), dt)
    dd = jax.nn.softmax(jax.random.normal(ks[2], (2,))).astype(jnp.float32)
    g2 = 1.0 + 0.1 * jax.random.normal(ks[3], (d,))
    b2 = 0.1 * jax.random.normal(ks[4], (d,))
    wfc1 = jax.random.normal(ks[5], (d, f), dt) * 0.05
    bfc1 = jax.random.normal(ks[6], (f,), dt) * 0.05
    wfc2 = jax.random.normal(ks[7], (f, d), dt) * 0.05
    bfc2 = jax.random.normal(ks[8], (d,), dt) * 0.05
    mask = (jax.random.uniform(ks[9], (f,)) > 0.25).astype(dt)
    args = (x, xin, dd, g2, b2, wfc1, bfc1, wfc2, bfc2, mask)
    bwd_kind = ("blend-bwd" if _mlp_blend_bwd_group(
        b, d, f, _pad_rows(n), full=True) is not None else "blend-bwd-split")

    fused = jax.jit(lambda *a: fused_mlp_ln_blend(*a, eps=1e-6))
    oracle = jax.jit(lambda *a: _composed_mlp_ln_blend(*a, 1e-6))
    of, oo = jax.device_get(fused(*args)), jax.device_get(oracle(*args))
    all_ok = record(name, "blend fwd", rel_err(of, oo), tol)

    def loss_f(*a):
        return jnp.sum(fused_mlp_ln_blend(
            *a, eps=1e-6).astype(jnp.float32) ** 2)

    def loss_o(*a):
        return jnp.sum(_composed_mlp_ln_blend(
            *a, 1e-6).astype(jnp.float32) ** 2)

    gf = jax.device_get(jax.jit(jax.grad(loss_f, argnums=tuple(range(10))))(
        *args))
    go = jax.device_get(jax.jit(jax.grad(loss_o, argnums=tuple(range(10))))(
        *args))
    names = ["dx", "dxin", "dd", "dg2", "db2", "dwfc1", "dbfc1", "dwfc2",
             "dbfc2", "dmask"]
    for nm, a_, b_ in zip(names, gf, go):
        all_ok &= record(name, f"{bwd_kind} {nm}", rel_err(a_, b_), 3 * tol)
    return all_ok


def check_performer(tol=3e-2):
    """Fused performer stage (ops/performer.py) vs composed XLA at the
    real T2T stem shapes, on-chip, bf16, fwd + grads."""
    import uvc_tpu.ops.performer as perf
    from uvc_tpu.models.t2t_vit import apply_performer, init_performer

    all_ok = True
    for name, b, n, dim, emb in [("t2t_stage1", 32, 3136, 147, 64),
                                 ("t2t_stage2", 32, 784, 576, 64)]:
        p = init_performer(jax.random.PRNGKey(0), dim, emb)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, n, dim),
                              jnp.bfloat16) * 0.5

        fused = jax.jit(lambda p, x: perf.fused_performer(
            p, x, dtype=jnp.bfloat16))
        orig = perf.fused_performer
        try:
            of = jax.device_get(fused(p, x))
            gf = jax.device_get(jax.jit(jax.grad(
                lambda p, x: jnp.sum(perf.fused_performer(
                    p, x, dtype=jnp.bfloat16).astype(jnp.float32) ** 2)))(
                    p, x))
            perf.fused_performer = lambda *a, **k: None  # force composed
            comp = jax.jit(lambda p, x: apply_performer(
                p, x, dtype=jnp.bfloat16))
            oc = jax.device_get(comp(p, x))
            gc = jax.device_get(jax.jit(jax.grad(
                lambda p, x: jnp.sum(apply_performer(
                    p, x, dtype=jnp.bfloat16).astype(jnp.float32) ** 2)))(
                    p, x))
        finally:
            perf.fused_performer = orig
        all_ok &= record(name, "fwd", rel_err(of, oc), tol)
        flat_c = dict(jax.tree_util.tree_leaves_with_path(gc))
        for path, val in jax.tree_util.tree_leaves_with_path(gf):
            pname = jax.tree_util.keystr(path)
            if "prm_w" in pname:
                continue
            all_ok &= record(name, f"grad {pname}",
                             rel_err(val, flat_c[path]), tol)
    return all_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the JSON artifact here "
                         "(e.g. KPARITY_r03.json)")
    opts = ap.parse_args()
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this harness is meant for the "
              "accelerator; interpret-mode coverage lives in "
              "tests/test_attention_kernel.py", file=sys.stderr)
    t0 = time.time()
    ok = True
    for name, b, n, d, heads in SHAPES:
        ok &= check(name, b, n, d, heads)
        ok &= check_ln(name, b, n, d, heads)
    # compact stage-2 widths: half the heads / half+lane-padded MLP of
    # Small and Base (train/compact_ft.py layers)
    ok &= check_ln_rect("compact_small", 64, 198, 384, 192, 3)
    ok &= check_ln_rect("compact_base", 32, 198, 768, 384, 6)
    # gated-block blend fusion (stage-1 hot path): Tiny unsplit, Small/Base
    # hidden-split backward, T2T's 3x ratio
    for bname, bb, bn, bd, bf in [("deit_tiny", 64, 198, 192, 768),
                                  ("deit_small", 64, 198, 384, 1536),
                                  ("deit_base", 32, 198, 768, 3072),
                                  ("t2t_14", 64, 197, 384, 1152)]:
        ok &= check_blend(bname, bb, bn, bd, bf)
    ok &= check_performer()
    wall = time.time() - t0
    if opts.out:
        with open(opts.out, "w") as f:
            json.dump({"harness": "tpu_kernel_parity",
                       "backend": jax.default_backend(),
                       "device": str(jax.devices()[0]),
                       "ok": bool(ok), "wall_s": round(wall, 1),
                       "rows": ROWS}, f, indent=1)
        print(f"wrote {opts.out}")
    print("ALL PASS" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
