"""attn_fwd efficiency lab (VERDICT r3 next-round #5).

The LN-fused attention forward achieves only 27-39% of its tile-adjusted
ceiling at every width (ROOFLINE_r03) while the backward — same matmul
shapes — runs ~2x more efficiently.  This times kernel VARIANTS of
_layer_ln_fwd_kernel on-chip to (a) attribute where the forward loses
(diagnostic variants with deliberately wrong numerics) and (b) measure
candidate fixes.  Variants:

  base     production kernel (ops/attention.py _layer_ln_fwd_kernel)
  d_nosm   DIAGNOSTIC: softmax deleted (ctx = logits @ v) — pure
           MXU/LN/projection time; the gap base-d_nosm = softmax cost
  d_noexp  DIAGNOSTIC: exp deleted (p = logits - m) — isolates the
           transcendental
  v_fold   scale*log2(e) folded into q ([N,dh] mul instead of [N,N]),
           exp2 instead of exp, reciprocal-mul instead of divide
  v_cat    v_fold + ONE softmax over the row-concat of all (group, head)
           logits ([G*H*N, N]) — fewer, larger VPU ops
  v_half   DIAGNOSTIC: 2x batch group (VMEM-permitting) — amortization

Usage: timeout 1800 python scripts/tpu_attn_fwd_lab.py tiny small [--out F]
"""

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/tmp/uvc_jaxcache")

from uvc_tpu.ops.attention import (_compiler_params, _layer_group,  # noqa
                                   _layer_ln_fwd_kernel, _ln_rows,
                                   _pad_rows)

MODELS = {
    "tiny": (512, 192, 3),
    "small": (256, 384, 6),
    "base": (128, 768, 12),
}
PEAK = 197e12
REPS = 30
LOG2E = math.log2(math.e)


def _variant_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref,
                    bproj_ref, mask_ref, o_ref, *, scale, n_valid, heads,
                    group, d, eps, mode):
    np_ = x_ref.shape[-2]
    dm = x_ref.shape[-1]
    dh = d // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    x32 = x_ref[...].reshape(group * np_, dm).astype(jnp.float32)
    a_in, _, _ = _ln_rows(x32, g1_ref[...].astype(jnp.float32),
                          b1_ref[...].astype(jnp.float32), eps)
    a_in = a_in.astype(jnp.bfloat16)
    if mode == "v_bf16qkv":
        # emit the qkv matmul in bf16 directly (MXU still accumulates
        # f32 internally) and add the bias in bf16: saves two f32
        # [g*N, 3d] elementwise passes vs accumulate-f32-then-convert
        qkv = (jnp.dot(a_in, wqkv_ref[...],
                       preferred_element_type=jnp.bfloat16)
               + bqkv_ref[...].astype(jnp.bfloat16))
    else:
        qkv = (jnp.dot(a_in, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = qkv.reshape(group, np_, 3 * d)

    if mode == "v_bdot":
        # ONE batched dot_general over all (group, head) slices instead
        # of G*H sequential per-head matmuls: fewer Mosaic ops, internal
        # pipelining.  Requires a [G*H, N, dh] relayout of q/k/v (head
        # lanes -> batch major), which is itself a cost — measured here.
        qkv4 = qkv.reshape(group, np_, 3, heads, dh)
        q4 = qkv4[:, :, 0].transpose(0, 2, 1, 3).reshape(
            group * heads, np_, dh)
        k4 = qkv4[:, :, 1].transpose(0, 2, 1, 3).reshape(
            group * heads, np_, dh)
        v4 = qkv4[:, :, 2].transpose(0, 2, 1, 3).reshape(
            group * heads, np_, dh)
        logits = jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + bias[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        c4 = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / s
        c4 = c4.reshape(group, heads, np_, dh).transpose(0, 2, 1, 3)
        ctxs = [c4[g, :, h] for g in range(group) for h in range(heads)]
    elif mode == "v_pack2":
        # head-packing (VERDICT r3 #4): process (g,h) entries in PAIRS.
        # QK^T: Q_blk = [[qa,0],[0,qb]] [2N,128] against K_pack=[ka|kb]
        # [N,128] gives stacked per-head logits [2N,N] with a FULL K=128
        # contraction (two half-filled K=64 matmuls otherwise).  PV:
        # P [2N,N] @ V_pack=[va|vb] [N,128] gives diag blocks = ctx.
        # Arithmetic: 2x the MACs of the separate path at 2x the MXU
        # occupancy — wall-clock parity at best, minus pack overhead,
        # plus fewer/larger ops (better pipelining).  Measured to settle
        # the VERDICT question with numbers.
        flat = [(g, h) for g in range(group) for h in range(heads)]
        ctx_by_idx = [None] * len(flat)
        z64 = jnp.zeros((np_, dh), jnp.bfloat16)
        for i in range(0, len(flat) - 1, 2):
            (ga, ha), (gb, hb) = flat[i], flat[i + 1]
            qa = qkv[ga, :, ha * dh:(ha + 1) * dh]
            ka = qkv[ga, :, d + ha * dh:d + (ha + 1) * dh]
            va = qkv[ga, :, 2 * d + ha * dh:2 * d + (ha + 1) * dh]
            qb = qkv[gb, :, hb * dh:(hb + 1) * dh]
            kb = qkv[gb, :, d + hb * dh:d + (hb + 1) * dh]
            vb = qkv[gb, :, 2 * d + hb * dh:2 * d + (hb + 1) * dh]
            q_blk = jnp.concatenate(
                [jnp.concatenate([qa, z64], 1),
                 jnp.concatenate([z64, qb], 1)], 0)       # [2N, 128]
            k_pack = jnp.concatenate([ka, kb], 1)          # [N, 128]
            logits = jax.lax.dot_general(
                q_blk, k_pack, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            col2 = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = logits + jnp.where(col2 < n_valid, 0.0,
                                        -1e30).astype(jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            v_pack = jnp.concatenate([va, vb], 1)          # [N, 128]
            o2 = jnp.dot(p.astype(jnp.bfloat16), v_pack,
                         preferred_element_type=jnp.float32) / s
            ctx_by_idx[i] = o2[:np_, :dh]
            ctx_by_idx[i + 1] = o2[np_:, dh:]
        if len(flat) % 2:
            g, h = flat[-1]
            q = qkv[g, :, h * dh:(h + 1) * dh]
            k = qkv[g, :, d + h * dh:d + (h + 1) * dh]
            v = qkv[g, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            ctx_by_idx[-1] = jnp.dot(
                p.astype(jnp.bfloat16), v,
                preferred_element_type=jnp.float32) / s
        ctxs = ctx_by_idx
    elif mode == "v_cat":
        logits_all = []
        for g in range(group):
            for h in range(heads):
                q = qkv[g, :, h * dh:(h + 1) * dh]
                k = qkv[g, :, d + h * dh:d + (h + 1) * dh]
                logits_all.append(jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
        ls = jnp.concatenate(logits_all, axis=0)      # [G*H*N, N]
        colc = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
        biasc = jnp.where(colc < n_valid, 0.0, -1e30).astype(jnp.float32)
        ls = ls * (scale * LOG2E) + biasc
        m = jnp.max(ls, axis=-1, keepdims=True)
        p = jnp.exp2(ls - m)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(jnp.bfloat16)
        ctxs = []
        for g in range(group):
            for h in range(heads):
                i = g * heads + h
                v = qkv[g, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
                ctxs.append(jnp.dot(
                    pb[i * np_:(i + 1) * np_], v,
                    preferred_element_type=jnp.float32)
                    * r[i * np_:(i + 1) * np_])
    else:
        ctxs = []
        for g in range(group):
            for h in range(heads):
                q = qkv[g, :, h * dh:(h + 1) * dh]
                k = qkv[g, :, d + h * dh:d + (h + 1) * dh]
                v = qkv[g, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
                if mode == "v_fold":
                    q32 = q.astype(jnp.float32) * (scale * LOG2E)
                    logits = jax.lax.dot_general(
                        q32.astype(jnp.bfloat16), k,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) + bias
                else:
                    logits = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale + bias
                if mode == "d_nosm":
                    ctxs.append(jnp.dot(
                        logits.astype(jnp.bfloat16), v,
                        preferred_element_type=jnp.float32))
                    continue
                m = jnp.max(logits, axis=-1, keepdims=True)
                if mode == "d_noexp":
                    p = logits - m
                else:
                    p = jnp.exp2(logits - m) if mode == "v_fold" \
                        else jnp.exp(logits - m)
                s = jnp.sum(p, axis=-1, keepdims=True)
                c = jnp.dot(p.astype(jnp.bfloat16), v,
                            preferred_element_type=jnp.float32)
                ctxs.append(c * (1.0 / s) if mode == "v_fold" else c / s)
    ctx = jnp.concatenate(
        [jnp.concatenate(ctxs[g * heads:(g + 1) * heads], axis=-1)
         for g in range(group)], axis=0).astype(jnp.bfloat16)
    ctx = ctx * mask_ref[...].astype(jnp.bfloat16)
    out = jnp.dot(ctx, wproj_ref[...],
                  preferred_element_type=jnp.float32) \
        + bproj_ref[...].astype(jnp.float32)
    o_ref[...] = (x32 + out).reshape(group, np_, dm).astype(o_ref.dtype)


def _call_variant(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, scale,
                  n_valid, num_heads, eps, mode, g):
    b, np_, dm = x.shape
    da = wqkv.shape[1] // 3
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    kern = (_layer_ln_fwd_kernel if mode == "base" else
            functools.partial(_variant_kernel, mode=mode))
    return pl.pallas_call(
        functools.partial(kern, scale=scale, n_valid=n_valid,
                          heads=num_heads, group=g, d=da, eps=eps),
        grid=(b // g,),
        in_specs=[xspec, wspec((dm,)), wspec((dm,)), wspec((dm, 3 * da)),
                  wspec((3 * da,)), wspec((da, dm)), wspec((dm,)),
                  wspec((da,))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, np_, dm), x.dtype),
        **_compiler_params(),
    )(x, g1, b1, wqkv, bqkv, wproj, bproj, mask)


def _drain(x):
    float(jax.device_get(jnp.sum(x).astype(jnp.float32)))


def _time_scan(fn, x, reps=REPS):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    out = run(x)
    _drain(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(x)
        _drain(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=["tiny", "small"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    results = {}
    for name in args.models:
        b, d, h = MODELS[name]
        n = 197
        np_ = _pad_rows(n)
        dh = d // h
        scale = dh ** -0.5
        eps = 1e-6
        key = jax.random.PRNGKey(0)
        x = 0.1 * jax.random.normal(key, (b, np_, d), jnp.bfloat16)
        g1 = jnp.ones((d,), jnp.float32)
        b1 = jnp.zeros((d,), jnp.float32)
        wqkv = (0.05 * jax.random.normal(
            jax.random.PRNGKey(1), (d, 3 * d))).astype(jnp.bfloat16)
        bqkv = jnp.zeros((3 * d,), jnp.bfloat16)
        wproj = (0.05 * jax.random.normal(
            jax.random.PRNGKey(2), (d, d))).astype(jnp.bfloat16)
        bproj = jnp.zeros((d,), jnp.bfloat16)
        mask = jnp.ones((d,), jnp.bfloat16)
        g = _layer_group(b, d, np_, ln=True)
        flops = b * (n * (3 * d * d + d * d) * 2
                     + h * n * n * dh * 2 * 2)
        print(f"== {name} B={b} d={d} h={h} g={g}", flush=True)
        rows = {}
        ref = None
        for mode in ("base", "d_nosm", "d_noexp", "v_fold", "v_cat",
                     "v_pack2", "v_bf16qkv", "v_bdot"):
            try:
                fn = lambda z: _call_variant(
                    z, g1, b1, wqkv, bqkv, wproj, bproj, mask, scale, n,
                    h, eps, mode, g)
                if mode in ("base", "v_fold", "v_cat", "v_pack2",
                            "v_bf16qkv", "v_bdot"):
                    a = jax.device_get(fn(x)[:2, :4, :6]).astype(float)
                    if ref is None:
                        ref = a
                    else:
                        import numpy as _np
                        err = float(_np.abs(a - ref).max())
                        if err > 2e-2:
                            print(f"  {mode}: NUMERIC MISMATCH {err}")
                dt = _time_scan(fn, x)
                tf = flops / dt / 1e12
                print(f"  {mode:8s} {dt*1e3:7.3f} ms  {tf:6.1f} TF/s",
                      flush=True)
                rows[mode] = {"ms": round(dt * 1e3, 3),
                              "tflops_s": round(tf, 1)}
            except Exception as e:  # noqa: BLE001
                print(f"  {mode:8s} FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:160]}", flush=True)
                rows[mode] = {"error": type(e).__name__}
        results[name] = rows
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
