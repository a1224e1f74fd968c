"""Fused token-performer stage (T2T stem) as Pallas TPU kernels.

The reference stem (T2TViT/models/token_performer.py:31-69) runs linear
attention over 3136/784 tokens as ~15 separate torch ops; composed in XLA
the chain moves >1 GB of [B, N, *] intermediates through HBM per stage and
ran at single-digit TFLOP/s.  Here the whole stage — LN -> kqv -> positive
random features -> linear attention -> proj(+v residual) -> LN -> MLP
(+residual) — runs as Pallas programs tiled over (batch-group, token-tile)
with all weights VMEM-resident:

  forward:   pass A accumulates the global sums  kptv = sum_i v_i (x) kp_i
             and kpsum = sum_i kp_i across token tiles (sequential grid,
             accumulator blocks with constant index_map);
             pass B recomputes kp/qp per tile and finishes the stage.
  backward:  pass A recomputes the sums; pass B1 computes all local grads
             (mlp/proj/LN2/q-path) while accumulating the global cotangents
             dkptv/dkpsum; pass B2 distributes those back through the
             k/v paths.  Weight grads accumulate in f32 VMEM blocks across
             the entire grid; the two dx contributions are summed by XLA.

Numerics follow the composed path exactly: f32 layer norms and prm_exp,
bf16 (compute-dtype) matmul inputs with f32 accumulation.  ``prm_w`` is
frozen in the reference (orthogonal random features, requires_grad=False);
its grad is returned as zeros.

Interpret mode runs the same code on CPU for the parity tests.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_est(bg: int, tile: int, dim: int, emb: int) -> int:
    """Worst-case (bwd1) per-program VMEM footprint estimate."""
    blocks = 2 * bg * tile * dim * 2 * 2      # x + dx, double-buffered
    small = 2 * bg * tile * emb * 2 * 2       # dout + out blocks
    # the per-group loop is unrolled, so Mosaic's scheduler can keep
    # several iterations' temporaries live at once: scale by bg
    scratch = bg * (tile * dim * 4 * 3        # xn32/xhat/dxn, f32
                    + tile * 3 * emb * 4 * 2  # kqv + dkqv, f32
                    + tile * emb * 4 * 4)     # y/attn/h2/a temporaries
    accums = dim * 3 * emb * 6 + 8 * emb * emb * 4
    return blocks + small + scratch + accums


def _choose_tiles(b: int, n: int, dim: int = 64, emb: int = 64):
    """(batch_group, token_tile) or (None, None) -> composed fallback."""
    tiles = [n] if n <= 784 else \
        [t for t in (784, 392) if n % t == 0]
    for tile in tiles:
        if tile % 8:
            continue
        for bg in (8, 4, 2, 1):
            if b % bg:
                continue
            if _vmem_est(bg, tile, dim, emb) < 13 * 1024 * 1024:
                return bg, tile
    return None, None


def _ln_f32(x, g, b, eps=1e-5, mask=None, count=None):
    """f32 layernorm; with (mask, count) the statistics cover only the
    masked feature slots (the space-to-depth expanded stem layout carries
    dead slots that must not pollute mean/var)."""
    x32 = x.astype(jnp.float32)
    if mask is None:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
    else:
        xm = x32 * mask
        mu = jnp.sum(xm, axis=-1, keepdims=True) / count
        var = jnp.sum((x32 - mu) ** 2 * mask, axis=-1,
                      keepdims=True) / count
    xhat = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return xhat * g.astype(jnp.float32) + b.astype(jnp.float32), xhat, \
        jax.lax.rsqrt(var + eps)


def _ln_vjp(dy32, xhat, rstd, g, mask=None, count=None):
    """d/dx of layernorm given upstream dy (f32), saved xhat and 1/std."""
    gd = dy32 * g.astype(jnp.float32)
    if mask is None:
        m1 = jnp.mean(gd, axis=-1, keepdims=True)
        m2 = jnp.mean(gd * xhat, axis=-1, keepdims=True)
        return (gd - m1 - xhat * m2) * rstd
    gd = gd * mask
    m1 = jnp.sum(gd, axis=-1, keepdims=True) / count
    m2 = jnp.sum(gd * xhat, axis=-1, keepdims=True) / count
    return (gd - m1 - xhat * m2) * rstd * mask


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (|err| < 1.5e-7 — far below bf16
    noise); Mosaic has no erf lowering, but exp is native VPU."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_and_grad(h32):
    """Exact-form gelu(h) and gelu'(h) in f32 (torch nn.GELU default)."""
    phi = 0.5 * (1.0 + _erf(h32 / math.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * h32 * h32) / math.sqrt(2.0 * math.pi)
    return h32 * phi, phi + h32 * pdf


def _recompute_front(xt, ln1g_ref, ln1b_ref, w2_ref, b2_ref,
                     dtype, fmask_ref=None, fcount=None):
    """LN1 + a column projection for one token tile (array, not ref).

    The split kernels pass a pre-concatenated [dim, 2*emb] weight (sums:
    k|v; apply/bwd1: q|v; bwd2: k|v) — exactly one MXU lane tile at
    emb=64; the merged kernels pass the full [dim, 3*emb] kqv so the
    front runs once per token instead of twice.
    Returns (xn32, xhat, rstd, proj[T, cols])."""
    mask = None if fmask_ref is None else fmask_ref[...].astype(jnp.float32)
    xn32, xhat, rstd = _ln_f32(xt, ln1g_ref[...], ln1b_ref[...],
                               mask=mask, count=fcount)
    proj = (jnp.dot(xn32.astype(dtype), w2_ref[...],
                    preferred_element_type=jnp.float32)
            + b2_ref[...].astype(jnp.float32))
    return xn32, xhat, rstd, proj


def _prm(t32, w_ref, m):
    """Positive random features, f32: exp(t w^T - |t|^2/2)/sqrt(m)."""
    xd = jnp.sum(t32 * t32, axis=-1, keepdims=True) / 2.0
    wtx = jax.lax.dot_general(
        t32, w_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.exp(wtx - xd) / math.sqrt(m)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _sums_kernel(x_ref, ln1g_ref, ln1b_ref, wkv_ref, bkv_ref, w_ref,
                 fmask_ref, kptv_ref, kpsum_ref, *, emb: int, m: int,
                 group: int, dtype, fcount):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        kptv_ref[...] = jnp.zeros(kptv_ref.shape, kptv_ref.dtype)
        kpsum_ref[...] = jnp.zeros(kpsum_ref.shape, kpsum_ref.dtype)

    for g in range(group):
        _, _, _, kv = _recompute_front(
            x_ref[g], ln1g_ref, ln1b_ref, wkv_ref, bkv_ref, dtype,
            fmask_ref if fcount else None, fcount)
        k = kv[:, :emb]
        v = kv[:, emb:].astype(dtype)
        kp = _prm(k, w_ref, m).astype(dtype)
        kptv_ref[g] += jax.lax.dot_general(
            v, kp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [emb, m]
        kpsum_ref[g] += jnp.sum(kp.astype(jnp.float32), axis=0,
                                keepdims=True)           # [1, m]


def _apply_kernel(x_ref, ln1g_ref, ln1b_ref, wqv_ref, bqv_ref, w_ref,
                  fmask_ref, wproj_ref, bproj_ref, ln2g_ref, ln2b_ref,
                  wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, kptv_ref,
                  kpsum_ref, o_ref, *, emb: int, m: int, group: int,
                  dtype, fcount):
    for g in range(group):
        _, _, _, qv = _recompute_front(
            x_ref[g], ln1g_ref, ln1b_ref, wqv_ref, bqv_ref, dtype,
            fmask_ref if fcount else None, fcount)
        q = qv[:, :emb]
        v = qv[:, emb:].astype(dtype)
        qp32 = _prm(q, w_ref, m)
        qp = qp32.astype(dtype)
        # N=1-column matmuls don't lower cleanly in Mosaic; use a VPU
        # multiply-reduce for the normalizer instead
        d = jnp.sum(qp32 * kpsum_ref[g], axis=-1, keepdims=True)  # [T, 1]
        y = jax.lax.dot_general(
            qp, kptv_ref[g].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / (d + 1e-8)
        attn = v.astype(jnp.float32) + (
            jnp.dot(y.astype(dtype), wproj_ref[...],
                    preferred_element_type=jnp.float32)
            + bproj_ref[...].astype(jnp.float32))
        h2, _, _ = _ln_f32(attn.astype(dtype), ln2g_ref[...], ln2b_ref[...])
        hh = (jnp.dot(h2.astype(dtype), wfc1_ref[...],
                      preferred_element_type=jnp.float32)
              + bfc1_ref[...].astype(jnp.float32))
        a, _ = _gelu_and_grad(hh)
        mlp = (jnp.dot(a.astype(dtype), wfc2_ref[...],
                       preferred_element_type=jnp.float32)
               + bfc2_ref[...].astype(jnp.float32))
        o_ref[g] = (attn + mlp).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd1_kernel(x_ref, ln1g_ref, ln1b_ref, wqv_ref, bqv_ref, w_ref,
                 fmask_ref, wproj_ref, bproj_ref, ln2g_ref, ln2b_ref,
                 wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, kptv_ref,
                 kpsum_ref, do_ref,
                 dx_ref, dkptv_ref, dkpsum_ref, dln1g_ref, dln1b_ref,
                 dwqv_ref, dbqv_ref, dwproj_ref, dbproj_ref, dln2g_ref,
                 dln2b_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref, *,
                 emb: int, m: int, group: int, dtype, fcount):
    """Local (q/v/proj/mlp) grads + global-cotangent accumulation."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init_w():
        for ref in (dln1g_ref, dln1b_ref, dwqv_ref, dbqv_ref, dwproj_ref,
                    dbproj_ref, dln2g_ref, dln2b_ref, dwfc1_ref, dbfc1_ref,
                    dwfc2_ref, dbfc2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init_b():
        dkptv_ref[...] = jnp.zeros(dkptv_ref.shape, dkptv_ref.dtype)
        dkpsum_ref[...] = jnp.zeros(dkpsum_ref.shape, dkpsum_ref.dtype)

    fmask = None if not fcount else fmask_ref[...].astype(jnp.float32)
    for g in range(group):
        xn32, xhat1, rstd1, qv = _recompute_front(
            x_ref[g], ln1g_ref, ln1b_ref, wqv_ref, bqv_ref, dtype,
            fmask_ref if fcount else None, fcount)
        q32 = qv[:, :emb]
        v = qv[:, emb:].astype(dtype)
        qp32 = _prm(q32, w_ref, m)
        qp = qp32.astype(dtype)
        d = jnp.sum(qp32 * kpsum_ref[g], axis=-1, keepdims=True)  # [T, 1]
        dd_inv = 1.0 / (d + 1e-8)
        y_pre = jax.lax.dot_general(
            qp, kptv_ref[g].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y_pre * dd_inv
        attn = v.astype(jnp.float32) + (
            jnp.dot(y.astype(dtype), wproj_ref[...],
                    preferred_element_type=jnp.float32)
            + bproj_ref[...].astype(jnp.float32))
        attn_b = attn.astype(dtype)
        h2_32, xhat2, rstd2 = _ln_f32(attn_b, ln2g_ref[...], ln2b_ref[...])
        h2 = h2_32.astype(dtype)
        hh = (jnp.dot(h2, wfc1_ref[...],
                      preferred_element_type=jnp.float32)
              + bfc1_ref[...].astype(jnp.float32))
        a32, dgelu = _gelu_and_grad(hh)
        a = a32.astype(dtype)

        do32 = do_ref[g].astype(jnp.float32)
        dob = do32.astype(dtype)
        # mlp backward
        dbfc2_ref[...] += jnp.sum(do32, axis=0, keepdims=True)
        dwfc2_ref[...] += jax.lax.dot_general(
            a, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = jax.lax.dot_general(
            dob, wfc2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dhh = da * dgelu
        dhh_b = dhh.astype(dtype)
        dbfc1_ref[...] += jnp.sum(dhh, axis=0, keepdims=True)
        dwfc1_ref[...] += jax.lax.dot_general(
            h2, dhh_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh2 = jax.lax.dot_general(
            dhh_b, wfc1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln2g_ref[...] += jnp.sum(dh2 * xhat2, axis=0, keepdims=True)
        dln2b_ref[...] += jnp.sum(dh2, axis=0, keepdims=True)
        dattn = do32 + _ln_vjp(dh2, xhat2, rstd2, ln2g_ref[...])
        dattn_b = dattn.astype(dtype)
        # proj backward
        dbproj_ref[...] += jnp.sum(dattn, axis=0, keepdims=True)
        dwproj_ref[...] += jax.lax.dot_general(
            y.astype(dtype), dattn_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = jax.lax.dot_general(
            dattn_b, wproj_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # y = y_pre / (d + eps)
        dy_pre = dy * dd_inv
        dd = -jnp.sum(dy * y, axis=-1, keepdims=True) * dd_inv   # [T, 1]
        dy_pre_b = dy_pre.astype(dtype)
        dqp = jnp.dot(dy_pre_b, kptv_ref[g].astype(dtype),
                      preferred_element_type=jnp.float32) \
            + dd * kpsum_ref[g]                                  # [T, m]
        dkptv_ref[g] += jax.lax.dot_general(
            dy_pre_b, qp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [emb, m]
        dkpsum_ref[g] += jnp.sum(dd * qp32, axis=0, keepdims=True)
        # prm_exp vjp (q path)
        dwtx = qp32 * dqp                                        # [T, m]
        dq = jax.lax.dot_general(
            dwtx.astype(dtype), w_ref[...].astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            - q32 * jnp.sum(dwtx, axis=-1, keepdims=True)
        # assemble d(q|v); the k path lives entirely in B2
        dqv = jnp.concatenate([dq, dattn], axis=-1)              # [T, 2e]
        dqv_b = dqv.astype(dtype)
        dbqv_ref[...] += jnp.sum(dqv, axis=0, keepdims=True)
        dwqv_ref[...] += jax.lax.dot_general(
            xn32.astype(dtype), dqv_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn = jax.lax.dot_general(
            dqv_b, wqv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln1g_ref[...] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
        dln1b_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
        dx_ref[g] = _ln_vjp(dxn, xhat1, rstd1, ln1g_ref[...],
                            fmask, fcount).astype(dx_ref.dtype)


def _bwd2_kernel(x_ref, ln1g_ref, ln1b_ref, wkv_ref, bkv_ref, w_ref,
                 fmask_ref, dkptv_ref, dkpsum_ref, dx_ref, dln1g_ref,
                 dln1b_ref, dwkv_ref, dbkv_ref, *, emb: int, m: int,
                 group: int, dtype, fcount):
    """k/v-global grads from the complete dkptv/dkpsum."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init_w():
        for ref in (dln1g_ref, dln1b_ref, dwkv_ref, dbkv_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    fmask = None if not fcount else fmask_ref[...].astype(jnp.float32)
    for g in range(group):
        xn32, xhat1, rstd1, kv = _recompute_front(
            x_ref[g], ln1g_ref, ln1b_ref, wkv_ref, bkv_ref, dtype,
            fmask_ref if fcount else None, fcount)
        k32 = kv[:, :emb]
        v = kv[:, emb:].astype(dtype)
        kp32 = _prm(k32, w_ref, m)
        # dv (global): kp @ dkptv^T
        dv = jax.lax.dot_general(
            kp32.astype(dtype), dkptv_ref[g].astype(dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [T, emb]
        # dkp: v @ dkptv + dkpsum
        dkp = jnp.dot(v, dkptv_ref[g].astype(dtype),
                      preferred_element_type=jnp.float32) \
            + dkpsum_ref[g]                                      # [T, m]
        dwtx = kp32 * dkp
        dk = jax.lax.dot_general(
            dwtx.astype(dtype), w_ref[...].astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            - k32 * jnp.sum(dwtx, axis=-1, keepdims=True)
        dkv = jnp.concatenate([dk, dv], axis=-1)                 # [T, 2e]
        dkv_b = dkv.astype(dtype)
        dbkv_ref[...] += jnp.sum(dkv, axis=0, keepdims=True)
        dwkv_ref[...] += jax.lax.dot_general(
            xn32.astype(dtype), dkv_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn = jax.lax.dot_general(
            dkv_b, wkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln1g_ref[...] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
        dln1b_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
        dx_ref[g] = _ln_vjp(dxn, xhat1, rstd1, ln1g_ref[...],
                            fmask, fcount).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _specs(bg, tile, dim, interpret):
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((bg, tile, dim), lambda i, j: (i, j, 0),
                         memory_space=mspace)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=mspace)

    def bspec(shape):   # per-batch-group accumulator, constant over tiles
        return pl.BlockSpec((bg,) + shape,
                            lambda i, j: (i,) + tuple(0 for _ in shape),
                            memory_space=mspace)

    return xspec, wspec, bspec


def _call_sums(x, ln1g, ln1b, wkv, bkv, w, fmask, bg, tile, dtype,
               interpret, fcount):
    b, n, dim = x.shape
    emb = wkv.shape[1] // 2
    m = w.shape[0]
    xspec, wspec, bspec = _specs(bg, tile, dim, interpret)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_sums_kernel, emb=emb, m=m, group=bg,
                          dtype=dtype, fcount=fcount),
        grid=(b // bg, n // tile),
        in_specs=[xspec, wspec((dim,)), wspec((dim,)),
                  wspec((dim, 2 * emb)), wspec((2 * emb,)),
                  wspec((m, emb)), wspec((dim,))],
        out_specs=(bspec((emb, m)), bspec((1, m))),
        out_shape=(jax.ShapeDtypeStruct((b, emb, m), f32),
                   jax.ShapeDtypeStruct((b, 1, m), f32)),
        interpret=interpret,
    )(x, ln1g, ln1b, wkv, bkv, w, fmask)


def _call_apply(x, args, kptv, kpsum, bg, tile, dtype, interpret, fcount):
    (ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b, wfc1,
     bfc1, wfc2, bfc2) = args
    b, n, dim = x.shape
    emb = wqv.shape[1] // 2
    m = w.shape[0]
    xspec, wspec, bspec = _specs(bg, tile, dim, interpret)
    ospec = pl.BlockSpec((bg, tile, emb), lambda i, j: (i, j, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_apply_kernel, emb=emb, m=m, group=bg,
                          dtype=dtype, fcount=fcount),
        grid=(b // bg, n // tile),
        in_specs=[xspec, wspec((dim,)), wspec((dim,)),
                  wspec((dim, 2 * emb)), wspec((2 * emb,)), wspec((m, emb)),
                  wspec((dim,)),
                  wspec((emb, emb)), wspec((emb,)), wspec((emb,)),
                  wspec((emb,)), wspec((emb, emb)), wspec((emb,)),
                  wspec((emb, emb)), wspec((emb,)),
                  bspec((emb, m)), bspec((1, m))],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, n, emb), x.dtype),
        interpret=interpret,
    )(x, ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b,
      wfc1, bfc1, wfc2, bfc2, kptv, kpsum)


def _call_bwd1(x, args, kptv, kpsum, dout, bg, tile, dtype, interpret,
               fcount):
    (ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b, wfc1,
     bfc1, wfc2, bfc2) = args
    b, n, dim = x.shape
    emb = wqv.shape[1] // 2
    m = w.shape[0]
    xspec, wspec, bspec = _specs(bg, tile, dim, interpret)
    dospec = pl.BlockSpec((bg, tile, emb), lambda i, j: (i, j, 0),
                          memory_space=pl.ANY if interpret else pltpu.VMEM)
    f32 = jnp.float32

    def acc(shape):     # whole-grid accumulator (constant index)
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bwd1_kernel, emb=emb, m=m, group=bg,
                          dtype=dtype, fcount=fcount),
        grid=(b // bg, n // tile),
        in_specs=[xspec, wspec((dim,)), wspec((dim,)),
                  wspec((dim, 2 * emb)), wspec((2 * emb,)), wspec((m, emb)),
                  wspec((dim,)),
                  wspec((emb, emb)), wspec((emb,)), wspec((emb,)),
                  wspec((emb,)), wspec((emb, emb)), wspec((emb,)),
                  wspec((emb, emb)), wspec((emb,)),
                  bspec((emb, m)), bspec((1, m)), dospec],
        out_specs=(xspec, bspec((emb, m)), bspec((1, m)),
                   acc((1, dim)), acc((1, dim)),
                   acc((dim, 2 * emb)), acc((1, 2 * emb)),
                   acc((emb, emb)), acc((1, emb)),
                   acc((1, emb)), acc((1, emb)),
                   acc((emb, emb)), acc((1, emb)),
                   acc((emb, emb)), acc((1, emb))),
        out_shape=(jax.ShapeDtypeStruct((b, n, dim), x.dtype),
                   jax.ShapeDtypeStruct((b, emb, m), f32),
                   jax.ShapeDtypeStruct((b, 1, m), f32),
                   jax.ShapeDtypeStruct((1, dim), f32),
                   jax.ShapeDtypeStruct((1, dim), f32),
                   jax.ShapeDtypeStruct((dim, 2 * emb), f32),
                   jax.ShapeDtypeStruct((1, 2 * emb), f32),
                   jax.ShapeDtypeStruct((emb, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((emb, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((emb, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32)),
        interpret=interpret,
    )(x, ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b,
      wfc1, bfc1, wfc2, bfc2, kptv, kpsum, dout)


def _call_bwd2(x, ln1g, ln1b, wkv, bkv, w, fmask, dkptv, dkpsum, bg,
               tile, dtype, interpret, fcount):
    b, n, dim = x.shape
    emb = wkv.shape[1] // 2
    m = w.shape[0]
    xspec, wspec, bspec = _specs(bg, tile, dim, interpret)
    f32 = jnp.float32

    def acc(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bwd2_kernel, emb=emb, m=m, group=bg,
                          dtype=dtype, fcount=fcount),
        grid=(b // bg, n // tile),
        in_specs=[xspec, wspec((dim,)), wspec((dim,)),
                  wspec((dim, 2 * emb)), wspec((2 * emb,)), wspec((m, emb)),
                  wspec((dim,)),
                  bspec((emb, m)), bspec((1, m))],
        out_specs=(xspec, acc((1, dim)), acc((1, dim)),
                   acc((dim, 2 * emb)), acc((1, 2 * emb))),
        out_shape=(jax.ShapeDtypeStruct((b, n, dim), x.dtype),
                   jax.ShapeDtypeStruct((1, dim), f32),
                   jax.ShapeDtypeStruct((1, dim), f32),
                   jax.ShapeDtypeStruct((dim, 2 * emb), f32),
                   jax.ShapeDtypeStruct((1, 2 * emb), f32)),
        interpret=interpret,
    )(x, ln1g, ln1b, wkv, bkv, w, fmask, dkptv, dkpsum)


# ---------------------------------------------------------------------------
# merged single-pass kernels
# ---------------------------------------------------------------------------
#
# The split kernels above pay the LN1 + front-projection recompute and a
# full x HBM stream TWICE per direction (sums+apply, bwd1+bwd2).  Measured
# on-chip (stage-1 shape [256, 3136, 192]) the pass decomposes as ~1.6 ms
# LN + ~1.3 ms front matmul + ~0.7 ms prm_exp + ~3 ms fixed pass overhead,
# so merging both phases of a direction into ONE program per batch-group —
# phase 1 looping token tiles (front once, full [dim, 3e] kqv), phase 2
# finishing from VMEM-buffered per-tile values — removes one LN, one
# 2-column projection, one x stream and one pass overhead per direction.


def _vmem_merged_fwd(bg, n, tile, dim, emb, m):
    blocks = 2 * bg * n * dim * 2 + 2 * bg * n * emb * 2 \
        + 2 * bg * (emb + 1) * m * 4
    saves = n * m * 4 + n * emb * 2            # qp32 + v scratch, shared
    # fori_loop over tiles: only ONE tile's temporaries are live
    scratch = tile * dim * 4 * 2 + tile * 3 * emb * 4 + tile * emb * 4 * 4
    weights = dim * 3 * emb * 2 * 2 + 8 * emb * emb * 2
    return blocks + saves + scratch + weights


def _vmem_merged_bwd(bg, n, tile, dim, emb, m):
    blocks = 2 * bg * n * dim * 2 * 2 + 2 * bg * n * emb * 2 \
        + 2 * bg * (emb + 1) * m * 4
    saves = n * dim * 4 + n * 4                # xhat1 f32 + rstd
    saves += n * emb * 4 + n * m * 4 + n * emb * 2   # k32, kp32, v
    scratch = tile * dim * 4 * 3 + tile * 3 * emb * 4 + tile * emb * 4 * 6
    accums = dim * 2 * emb * 4 * 2 + 10 * emb * emb * 4 \
        + dim * 3 * emb * 2 * 3
    return blocks + saves + scratch + accums


def _choose_merged(b: int, n: int, dim: int, emb: int, m: int):
    """((bg_f, tile_f), (bg_b, tile_b)) or None -> split-kernel path.
    Forward and backward tile independently (the backward buffers much
    more per batch item, so it usually runs at bg=1 / a smaller tile).
    A single-tile backward (ntiles == 1) gets a looser budget: with one
    tile the phase-1 fori_loop collapses and Mosaic's measured VMEM
    comes in well under the estimate (stage-2 [784, 576]: est 14.7M
    compiles and beats the 392-tile split by ~20%), while multi-tile
    configs at the same estimate genuinely OOM (stage-1 bwd (1, 784))."""
    budget = 13 * 1024 * 1024
    single_budget = 15 * 1024 * 1024
    tiles = [t for t in (n, 784, 392, 112)
             if t <= n and n % t == 0 and t % 8 == 0]

    def pick(est, single_ok=False):
        for tile in tiles:
            cap = single_budget if (single_ok and tile == n) else budget
            for bg in (4, 2, 1):
                if b % bg:
                    continue
                if est(bg, n, tile, dim, emb, m) < cap:
                    return bg, tile
        return None

    f = pick(_vmem_merged_fwd)
    bw = pick(_vmem_merged_bwd, single_ok=True)
    if f is None or bw is None:
        return None
    return f, bw


def _fwd_merged_kernel(x_ref, ln1g_ref, ln1b_ref, wkqv_ref, bkqv_ref,
                       w_ref, fmask_ref, wproj_ref, bproj_ref, ln2g_ref,
                       ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                       o_ref, kptv_ref, kpsum_ref, qp_s, v_s, *,
                       emb: int, m: int, ntiles: int, group: int, dtype,
                       fcount):
    """Whole forward stage for `group` batch items in one program.

    Tiles run under lax.fori_loop (not Python unroll) so only one tile's
    temporaries are ever live — the unrolled form blew the 16M VMEM stack
    at stage-1 shapes.  qp/v cross from the sums phase to the apply phase
    through VMEM scratch, reused across the (unrolled) group loop."""
    n = x_ref.shape[1]
    tile = n // ntiles
    for g in range(group):
        def phase1(t, carry):
            kptv, kpsum = carry
            sl = pl.ds(t * tile, tile)
            _, _, _, kqv = _recompute_front(
                x_ref[g, sl, :], ln1g_ref, ln1b_ref, wkqv_ref, bkqv_ref,
                dtype, fmask_ref if fcount else None, fcount)
            k = kqv[:, :emb]
            q = kqv[:, emb:2 * emb]
            v = kqv[:, 2 * emb:].astype(dtype)
            kp = _prm(k, w_ref, m).astype(dtype)
            qp_s[sl, :] = _prm(q, w_ref, m)
            v_s[sl, :] = v
            kptv += jax.lax.dot_general(
                v, kp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [emb, m]
            kpsum += jnp.sum(kp.astype(jnp.float32), axis=0, keepdims=True)
            return kptv, kpsum

        kptv, kpsum = jax.lax.fori_loop(
            0, ntiles, phase1, (jnp.zeros((emb, m), jnp.float32),
                                jnp.zeros((1, m), jnp.float32)))
        kptv_ref[g] = kptv
        kpsum_ref[g] = kpsum
        kptv_b = kptv.astype(dtype)

        def phase2(t, carry):
            sl = pl.ds(t * tile, tile)
            qp32 = qp_s[sl, :]
            v = v_s[sl, :]
            d = jnp.sum(qp32 * kpsum, axis=-1, keepdims=True)    # [T, 1]
            y = jax.lax.dot_general(
                qp32.astype(dtype), kptv_b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) / (d + 1e-8)
            attn = v.astype(jnp.float32) + (
                jnp.dot(y.astype(dtype), wproj_ref[...],
                        preferred_element_type=jnp.float32)
                + bproj_ref[...].astype(jnp.float32))
            h2, _, _ = _ln_f32(attn.astype(dtype), ln2g_ref[...],
                               ln2b_ref[...])
            hh = (jnp.dot(h2.astype(dtype), wfc1_ref[...],
                          preferred_element_type=jnp.float32)
                  + bfc1_ref[...].astype(jnp.float32))
            a, _ = _gelu_and_grad(hh)
            mlp = (jnp.dot(a.astype(dtype), wfc2_ref[...],
                           preferred_element_type=jnp.float32)
                   + bfc2_ref[...].astype(jnp.float32))
            o_ref[g, sl, :] = (attn + mlp).astype(o_ref.dtype)
            return carry

        jax.lax.fori_loop(0, ntiles, phase2, 0)


def _bwd_merged_kernel(x_ref, ln1g_ref, ln1b_ref, wkqv_ref, bkqv_ref,
                       wkv_ref, wqv_ref, w_ref, fmask_ref, wproj_ref,
                       bproj_ref, ln2g_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                       wfc2_ref, bfc2_ref, kptv_ref, kpsum_ref, do_ref,
                       dx_ref, dln1g_ref, dln1b_ref, dwqv_ref, dbqv_ref,
                       dwkv_ref, dbkv_ref, dwproj_ref, dbproj_ref,
                       dln2g_ref, dln2b_ref, dwfc1_ref, dbfc1_ref,
                       dwfc2_ref, dbfc2_ref, xhat_s, rstd_s, k_s, kp_s,
                       v_s, *, emb: int, m: int, ntiles: int, group: int,
                       dtype, fcount):
    """bwd1 + bwd2 in one program: phase 1 recomputes the front ONCE per
    tile (full kqv), runs all local grads and accumulates dkptv/dkpsum
    while buffering (xhat, rstd, k, kp, v) in VMEM scratch; phase 2
    distributes the complete global cotangents through the k/v paths
    from the buffers, accumulating into the dx block in place.  Tiles
    run under lax.fori_loop so only one tile's temporaries are live."""
    @pl.when(pl.program_id(0) == 0)
    def _init_w():
        for ref in (dln1g_ref, dln1b_ref, dwqv_ref, dbqv_ref, dwkv_ref,
                    dbkv_ref, dwproj_ref, dbproj_ref, dln2g_ref, dln2b_ref,
                    dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    n = x_ref.shape[1]
    tile = n // ntiles
    fmask = None if not fcount else fmask_ref[...].astype(jnp.float32)
    g1_32 = ln1g_ref[...].astype(jnp.float32)
    b1_32 = ln1b_ref[...].astype(jnp.float32)
    for g in range(group):
        kptv_b = kptv_ref[g].astype(dtype)

        def phase1(t, carry):
            dkptv, dkpsum = carry
            sl = pl.ds(t * tile, tile)
            xn32, xhat1, rstd1, kqv = _recompute_front(
                x_ref[g, sl, :], ln1g_ref, ln1b_ref, wkqv_ref, bkqv_ref,
                dtype, fmask_ref if fcount else None, fcount)
            k32 = kqv[:, :emb]
            q32 = kqv[:, emb:2 * emb]
            v = kqv[:, 2 * emb:].astype(dtype)
            kp32 = _prm(k32, w_ref, m)
            qp32 = _prm(q32, w_ref, m)
            qp = qp32.astype(dtype)
            d = jnp.sum(qp32 * kpsum_ref[g], axis=-1, keepdims=True)
            dd_inv = 1.0 / (d + 1e-8)
            y_pre = jax.lax.dot_general(
                qp, kptv_b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = y_pre * dd_inv
            attn = v.astype(jnp.float32) + (
                jnp.dot(y.astype(dtype), wproj_ref[...],
                        preferred_element_type=jnp.float32)
                + bproj_ref[...].astype(jnp.float32))
            attn_b = attn.astype(dtype)
            h2_32, xhat2, rstd2 = _ln_f32(attn_b, ln2g_ref[...],
                                          ln2b_ref[...])
            h2 = h2_32.astype(dtype)
            hh = (jnp.dot(h2, wfc1_ref[...],
                          preferred_element_type=jnp.float32)
                  + bfc1_ref[...].astype(jnp.float32))
            a32, dgelu = _gelu_and_grad(hh)
            a = a32.astype(dtype)

            do32 = do_ref[g, sl, :].astype(jnp.float32)
            dob = do32.astype(dtype)
            # mlp backward
            dbfc2_ref[...] += jnp.sum(do32, axis=0, keepdims=True)
            dwfc2_ref[...] += jax.lax.dot_general(
                a, dob, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            da = jax.lax.dot_general(
                dob, wfc2_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dhh = da * dgelu
            dhh_b = dhh.astype(dtype)
            dbfc1_ref[...] += jnp.sum(dhh, axis=0, keepdims=True)
            dwfc1_ref[...] += jax.lax.dot_general(
                h2, dhh_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dh2 = jax.lax.dot_general(
                dhh_b, wfc1_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dln2g_ref[...] += jnp.sum(dh2 * xhat2, axis=0, keepdims=True)
            dln2b_ref[...] += jnp.sum(dh2, axis=0, keepdims=True)
            dattn = do32 + _ln_vjp(dh2, xhat2, rstd2, ln2g_ref[...])
            dattn_b = dattn.astype(dtype)
            # proj backward
            dbproj_ref[...] += jnp.sum(dattn, axis=0, keepdims=True)
            dwproj_ref[...] += jax.lax.dot_general(
                y.astype(dtype), dattn_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dy = jax.lax.dot_general(
                dattn_b, wproj_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dy_pre = dy * dd_inv
            dd = -jnp.sum(dy * y, axis=-1, keepdims=True) * dd_inv
            dy_pre_b = dy_pre.astype(dtype)
            dqp = jnp.dot(dy_pre_b, kptv_b,
                          preferred_element_type=jnp.float32) \
                + dd * kpsum_ref[g]                              # [T, m]
            dkptv = dkptv + jax.lax.dot_general(
                dy_pre_b, qp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dkpsum = dkpsum + jnp.sum(dd * qp32, axis=0, keepdims=True)
            # prm_exp vjp (q path)
            dwtx = qp32 * dqp
            dq = jax.lax.dot_general(
                dwtx.astype(dtype), w_ref[...].astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) \
                - q32 * jnp.sum(dwtx, axis=-1, keepdims=True)
            dqv = jnp.concatenate([dq, dattn], axis=-1)          # [T, 2e]
            dqv_b = dqv.astype(dtype)
            dbqv_ref[...] += jnp.sum(dqv, axis=0, keepdims=True)
            dwqv_ref[...] += jax.lax.dot_general(
                xn32.astype(dtype), dqv_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxn = jax.lax.dot_general(
                dqv_b, wqv_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dln1g_ref[...] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
            dln1b_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
            dx_ref[g, sl, :] = _ln_vjp(dxn, xhat1, rstd1, ln1g_ref[...],
                                       fmask, fcount).astype(dx_ref.dtype)
            xhat_s[sl, :] = xhat1
            rstd_s[sl, :] = rstd1
            k_s[sl, :] = k32
            kp_s[sl, :] = kp32
            v_s[sl, :] = v
            return dkptv, dkpsum

        dkptv, dkpsum = jax.lax.fori_loop(
            0, ntiles, phase1, (jnp.zeros((emb, m), jnp.float32),
                                jnp.zeros((1, m), jnp.float32)))
        # phase 2: k/v-global grads from the complete dkptv/dkpsum
        dkptv_b = dkptv.astype(dtype)

        def phase2(t, carry):
            sl = pl.ds(t * tile, tile)
            xhat1 = xhat_s[sl, :]
            rstd1 = rstd_s[sl, :]
            k32 = k_s[sl, :]
            kp32 = kp_s[sl, :]
            v = v_s[sl, :]
            xn32 = xhat1 * g1_32 + b1_32        # bitwise _ln_f32 output
            dv = jax.lax.dot_general(
                kp32.astype(dtype), dkptv_b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [T, emb]
            dkp = jnp.dot(v, dkptv_b,
                          preferred_element_type=jnp.float32) + dkpsum
            dwtx = kp32 * dkp
            dk = jax.lax.dot_general(
                dwtx.astype(dtype), w_ref[...].astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) \
                - k32 * jnp.sum(dwtx, axis=-1, keepdims=True)
            dkv = jnp.concatenate([dk, dv], axis=-1)             # [T, 2e]
            dkv_b = dkv.astype(dtype)
            dbkv_ref[...] += jnp.sum(dkv, axis=0, keepdims=True)
            dwkv_ref[...] += jax.lax.dot_general(
                xn32.astype(dtype), dkv_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxn = jax.lax.dot_general(
                dkv_b, wkv_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dln1g_ref[...] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
            dln1b_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
            dx_ref[g, sl, :] += _ln_vjp(dxn, xhat1, rstd1, ln1g_ref[...],
                                        fmask, fcount).astype(dx_ref.dtype)
            return carry

        jax.lax.fori_loop(0, ntiles, phase2, 0)


def _merged_compiler_params(interpret):
    """Raise the scoped-VMEM cap for the merged programs: the stage-1
    backward at the s2d fmask shape sits 168K over Mosaic's 16M default
    (the masked-LN temporaries), and v5e's physical VMEM is far larger —
    a 20M cap compiles and costs nothing when under the default."""
    if interpret:
        return {}
    try:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=20 * 1024 * 1024)}
    except Exception:  # pragma: no cover - older pallas signature
        return {}


def _merged_specs(bg, n, dim, emb, interpret):
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((bg, n, dim), lambda i: (i, 0, 0),
                         memory_space=mspace)
    ospec = pl.BlockSpec((bg, n, emb), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    def bspec(shape):
        return pl.BlockSpec((bg,) + shape,
                            lambda i: (i,) + tuple(0 for _ in shape),
                            memory_space=mspace)

    return xspec, ospec, wspec, bspec


def _call_fwd_merged(x, args, bg, tile, dtype, interpret, fcount):
    (ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b, wfc1,
     bfc1, wfc2, bfc2) = args
    b, n, dim = x.shape
    emb = wkqv.shape[1] // 3
    m = w.shape[0]
    xspec, ospec, wspec, bspec = _merged_specs(bg, n, dim, emb, interpret)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_fwd_merged_kernel, emb=emb, m=m,
                          ntiles=n // tile, group=bg, dtype=dtype,
                          fcount=fcount),
        grid=(b // bg,),
        in_specs=[xspec, wspec((dim,)), wspec((dim,)),
                  wspec((dim, 3 * emb)), wspec((3 * emb,)),
                  wspec((m, emb)), wspec((dim,)),
                  wspec((emb, emb)), wspec((emb,)), wspec((emb,)),
                  wspec((emb,)), wspec((emb, emb)), wspec((emb,)),
                  wspec((emb, emb)), wspec((emb,))],
        out_specs=(ospec, bspec((emb, m)), bspec((1, m))),
        out_shape=(jax.ShapeDtypeStruct((b, n, emb), x.dtype),
                   jax.ShapeDtypeStruct((b, emb, m), f32),
                   jax.ShapeDtypeStruct((b, 1, m), f32)),
        scratch_shapes=[pltpu.VMEM((n, m), f32),      # qp32
                        pltpu.VMEM((n, emb), x.dtype)],  # v
        interpret=interpret,
        **_merged_compiler_params(interpret),
    )(x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b,
      wfc1, bfc1, wfc2, bfc2)


def _call_bwd_merged(x, args, wkv, wqv, kptv, kpsum, dout, bg, tile,
                     dtype, interpret, fcount):
    (ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b, wfc1,
     bfc1, wfc2, bfc2) = args
    b, n, dim = x.shape
    emb = wkqv.shape[1] // 3
    m = w.shape[0]
    xspec, ospec, wspec, bspec = _merged_specs(bg, n, dim, emb, interpret)
    f32 = jnp.float32

    def acc(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_bwd_merged_kernel, emb=emb, m=m,
                          ntiles=n // tile, group=bg, dtype=dtype,
                          fcount=fcount),
        grid=(b // bg,),
        in_specs=[xspec, wspec((dim,)), wspec((dim,)),
                  wspec((dim, 3 * emb)), wspec((3 * emb,)),
                  wspec((dim, 2 * emb)), wspec((dim, 2 * emb)),
                  wspec((m, emb)), wspec((dim,)),
                  wspec((emb, emb)), wspec((emb,)), wspec((emb,)),
                  wspec((emb,)), wspec((emb, emb)), wspec((emb,)),
                  wspec((emb, emb)), wspec((emb,)),
                  bspec((emb, m)), bspec((1, m)), ospec],
        out_specs=(xspec, acc((1, dim)), acc((1, dim)),
                   acc((dim, 2 * emb)), acc((1, 2 * emb)),
                   acc((dim, 2 * emb)), acc((1, 2 * emb)),
                   acc((emb, emb)), acc((1, emb)),
                   acc((1, emb)), acc((1, emb)),
                   acc((emb, emb)), acc((1, emb)),
                   acc((emb, emb)), acc((1, emb))),
        out_shape=(jax.ShapeDtypeStruct((b, n, dim), x.dtype),
                   jax.ShapeDtypeStruct((1, dim), f32),
                   jax.ShapeDtypeStruct((1, dim), f32),
                   jax.ShapeDtypeStruct((dim, 2 * emb), f32),
                   jax.ShapeDtypeStruct((1, 2 * emb), f32),
                   jax.ShapeDtypeStruct((dim, 2 * emb), f32),
                   jax.ShapeDtypeStruct((1, 2 * emb), f32),
                   jax.ShapeDtypeStruct((emb, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((emb, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32),
                   jax.ShapeDtypeStruct((emb, emb), f32),
                   jax.ShapeDtypeStruct((1, emb), f32)),
        scratch_shapes=[pltpu.VMEM((n, dim), f32),       # xhat1
                        pltpu.VMEM((n, 1), f32),         # rstd
                        pltpu.VMEM((n, emb), f32),       # k32
                        pltpu.VMEM((n, m), f32),         # kp32
                        pltpu.VMEM((n, emb), x.dtype)],  # v
        interpret=interpret,
        **_merged_compiler_params(interpret),
    )(x, ln1g, ln1b, wkqv, bkqv, wkv, wqv, w, fmask, wproj, bproj,
      ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, kptv, kpsum, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _fused_performer_merged(x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj,
                            bproj, ln2g, ln2b, wfc1, bfc1, wfc2, bfc2,
                            fwd_cfg, bwd_cfg, interpret, fcount):
    args = (ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    out, _, _ = _call_fwd_merged(x, args, fwd_cfg[0], fwd_cfg[1], x.dtype,
                                 interpret, fcount)
    return out


def _fused_performer_merged_fwd(x, ln1g, ln1b, wkqv, bkqv, w, fmask,
                                wproj, bproj, ln2g, ln2b, wfc1, bfc1,
                                wfc2, bfc2, fwd_cfg, bwd_cfg, interpret,
                                fcount):
    args = (ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    out, kptv, kpsum = _call_fwd_merged(x, args, fwd_cfg[0], fwd_cfg[1],
                                        x.dtype, interpret, fcount)
    return out, (x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g,
                 ln2b, wfc1, bfc1, wfc2, bfc2, kptv, kpsum)


def _fused_performer_merged_bwd(fwd_cfg, bwd_cfg, interpret, fcount, res,
                                dout):
    (x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b, wfc1,
     bfc1, wfc2, bfc2, kptv, kpsum) = res
    emb = wkqv.shape[1] // 3
    wkv, _, wqv, _ = _split_kqv(wkqv, bkqv)
    args = (ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    (dx, dg1, db1, dwqv, dbqv, dwkv, dbkv, dwproj, dbproj, dg2, db2,
     dwfc1, dbfc1, dwfc2, dbfc2) = _call_bwd_merged(
        x, args, wkv, wqv, kptv, kpsum, dout, bwd_cfg[0], bwd_cfg[1],
        x.dtype, interpret, fcount)
    dwkqv = jnp.concatenate(
        [dwkv[:, :emb], dwqv[:, :emb], dwqv[:, emb:] + dwkv[:, emb:]],
        axis=1)
    dbkqv = jnp.concatenate(
        [dbkv[0, :emb], dbqv[0, :emb], dbqv[0, emb:] + dbkv[0, emb:]])
    return (
        dx.astype(x.dtype),
        dg1[0].astype(ln1g.dtype),
        db1[0].astype(ln1b.dtype),
        dwkqv.astype(wkqv.dtype),
        dbkqv.astype(bkqv.dtype),
        jnp.zeros_like(w),
        jnp.zeros_like(fmask),
        dwproj.astype(wproj.dtype),
        dbproj[0].astype(bproj.dtype),
        dg2[0].astype(ln2g.dtype),
        db2[0].astype(ln2b.dtype),
        dwfc1.astype(wfc1.dtype),
        dbfc1[0].astype(bfc1.dtype),
        dwfc2.astype(wfc2.dtype),
        dbfc2[0].astype(bfc2.dtype),
    )


_fused_performer_merged.defvjp(_fused_performer_merged_fwd,
                               _fused_performer_merged_bwd)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


def _split_kqv(wkqv, bkqv):
    """[dim, 3e] -> ([k|v], [q|v]) two-column blocks: each is exactly one
    MXU lane tile at emb=64, and each kernel projects a third less than
    the full kqv.  q|v is a contiguous slice; k|v needs one concat."""
    emb = wkqv.shape[1] // 3
    wkv = jnp.concatenate([wkqv[:, :emb], wkqv[:, 2 * emb:]], axis=1)
    bkv = jnp.concatenate([bkqv[:emb], bkqv[2 * emb:]])
    return wkv, bkv, wkqv[:, emb:], bkqv[emb:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _fused_performer(x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj,
                     ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, bg, tile,
                     interpret, fcount):
    dtype = x.dtype
    wkv, bkv, wqv, bqv = _split_kqv(wkqv, bkqv)
    args = (ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    kptv, kpsum = _call_sums(x, ln1g, ln1b, wkv, bkv, w, fmask, bg,
                             tile, dtype, interpret, fcount)
    return _call_apply(x, args, kptv, kpsum, bg, tile, dtype, interpret,
                       fcount)


def _fused_performer_fwd(x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj,
                         bproj, ln2g, ln2b, wfc1, bfc1, wfc2, bfc2, bg,
                         tile, interpret, fcount):
    dtype = x.dtype
    wkv, bkv, wqv, bqv = _split_kqv(wkqv, bkqv)
    args = (ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    kptv, kpsum = _call_sums(x, ln1g, ln1b, wkv, bkv, w, fmask, bg,
                             tile, dtype, interpret, fcount)
    out = _call_apply(x, args, kptv, kpsum, bg, tile, dtype, interpret,
                      fcount)
    # kptv/kpsum ride along as residuals ([B, emb, m] f32 — a few MB):
    # the backward previously re-ran the whole sums pass (LN + k|v matmul
    # + prm over every token tile) to rebuild them
    return out, (x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g,
                 ln2b, wfc1, bfc1, wfc2, bfc2, kptv, kpsum)


def _fused_performer_bwd(bg, tile, interpret, fcount, res, dout):
    (x, ln1g, ln1b, wkqv, bkqv, w, fmask, wproj, bproj, ln2g, ln2b, wfc1,
     bfc1, wfc2, bfc2, kptv, kpsum) = res
    dtype = x.dtype
    emb = wkqv.shape[1] // 3
    wkv, bkv, wqv, bqv = _split_kqv(wkqv, bkqv)
    args = (ln1g, ln1b, wqv, bqv, w, fmask, wproj, bproj, ln2g, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    (dx1, dkptv, dkpsum, dg1a, db1a, dwqv, dbqv, dwproj, dbproj,
     dg2, db2, dwfc1, dbfc1, dwfc2, dbfc2) = _call_bwd1(
        x, args, kptv, kpsum, dout, bg, tile, dtype, interpret, fcount)
    dx2, dg1b, db1b, dwkv, dbkv = _call_bwd2(
        x, ln1g, ln1b, wkv, bkv, w, fmask, dkptv, dkpsum, bg, tile,
        dtype, interpret, fcount)
    # reassemble the full kqv grads: k from B2, q from B1, v from both
    dwkqv = jnp.concatenate(
        [dwkv[:, :emb], dwqv[:, :emb], dwqv[:, emb:] + dwkv[:, emb:]],
        axis=1)
    dbkqv = jnp.concatenate(
        [dbkv[0, :emb], dbqv[0, :emb], dbqv[0, emb:] + dbkv[0, emb:]])
    return (
        (dx1 + dx2).astype(x.dtype),
        (dg1a + dg1b)[0].astype(ln1g.dtype),
        (db1a + db1b)[0].astype(ln1b.dtype),
        dwkqv.astype(wkqv.dtype),
        dbkqv.astype(bkqv.dtype),
        jnp.zeros_like(w),        # prm_w frozen (requires_grad=False)
        jnp.zeros_like(fmask),    # constant slot mask
        dwproj.astype(wproj.dtype),
        dbproj[0].astype(bproj.dtype),
        dg2[0].astype(ln2g.dtype),
        db2[0].astype(ln2b.dtype),
        dwfc1.astype(wfc1.dtype),
        dbfc1[0].astype(bfc1.dtype),
        dwfc2.astype(wfc2.dtype),
        dbfc2[0].astype(bfc2.dtype),
    )


_fused_performer.defvjp(_fused_performer_fwd, _fused_performer_bwd)


# one-program-per-batch-group kernels (halved LN/front recompute); flag
# read at import like UVC_FUSED_MLP — set 0 to force the split kernels
_MERGED_DEFAULT = os.environ.get("UVC_PERF_MERGED", "1") != "0"


def fused_performer(p: dict, x: jax.Array, *, dtype,
                    interpret: bool = False,
                    feat_idx: Optional[np.ndarray] = None,
                    merged: Optional[bool] = None
                    ) -> Optional[jax.Array]:
    """Whole token-performer stage as Pallas programs; returns None when
    the shape doesn't tile (caller uses the composed path).  ``p`` is the
    performer param dict of models/t2t_vit.py (kqv/proj/mlp_fc1/mlp_fc2/
    norm1/norm2/prm_w).

    ``feat_idx`` (static int array, -1 = dead slot) declares that ``x``
    carries the stage input in an EXPANDED feature layout (e.g. the
    space-to-depth neighborhood form of s2d_stage1_inputs): kqv kernel
    rows and the LN1 affine are scattered to the expanded layout (grads
    gather back automatically through the XLA scatter VJP), and the LN1
    statistics run over the live slots only."""
    b, n, dim = x.shape
    emb = p["kqv"]["kernel"].shape[1] // 3
    m = p["prm_w"].shape[0]
    if merged is None:
        merged = _MERGED_DEFAULT
    cfgs = _choose_merged(b, n, dim, emb, m) if merged else None
    bg, tile = (None, None) if cfgs is not None \
        else _choose_tiles(b, n, dim, emb)
    if cfgs is None and bg is None:
        return None
    cast = lambda t: t.astype(dtype)  # noqa: E731
    wkqv, bkqv = p["kqv"]["kernel"], p["kqv"]["bias"]
    g1 = p["norm1"]["scale"].astype(jnp.float32)
    b1 = p["norm1"]["bias"].astype(jnp.float32)
    if feat_idx is None:
        fmask = jnp.ones((dim,), jnp.float32)
        fcount = None
    else:
        idx = np.asarray(feat_idx)
        valid = idx >= 0
        safe = jnp.asarray(np.where(valid, idx, 0))
        if valid.all():
            # pure permutation (the (kh,kw,c)-ordered unfold): layernorm
            # statistics are permutation-invariant — no masking needed
            wkqv = wkqv[safe]
            g1, b1 = g1[safe], b1[safe]
            fmask = jnp.ones((dim,), jnp.float32)
            fcount = None
        else:
            vmask = jnp.asarray(valid, jnp.float32)
            wkqv = wkqv[safe] * vmask[:, None]
            g1 = g1[safe] * vmask
            b1 = b1[safe] * vmask
            fmask = vmask
            fcount = float(valid.sum())
    tensors = (
        x.astype(dtype), g1, b1, cast(wkqv), cast(bkqv),
        jax.lax.stop_gradient(p["prm_w"]).astype(jnp.float32),
        fmask,
        cast(p["proj"]["kernel"]), cast(p["proj"]["bias"]),
        p["norm2"]["scale"].astype(jnp.float32),
        p["norm2"]["bias"].astype(jnp.float32),
        cast(p["mlp_fc1"]["kernel"]), cast(p["mlp_fc1"]["bias"]),
        cast(p["mlp_fc2"]["kernel"]), cast(p["mlp_fc2"]["bias"]))
    if cfgs is not None:
        return _fused_performer_merged(*tensors, cfgs[0], cfgs[1],
                                       interpret, fcount)
    return _fused_performer(*tensors, bg, tile, interpret, fcount)


def s2d_stage1_inputs(x: jax.Array):
    """Space-to-depth form of the stage-1 soft split (k=7, s=4, p=2).

    The nn.Unfold gather at 3-channel granularity wastes 125/128 vector
    lanes on every copy (measured ~20 ms/step on the T2T stage-1 stem);
    instead: pad to the 4-aligned grid, space-to-depth 4x4 (one clean
    transpose at 16c lanes), and concatenate the 2x2 block neighborhood —
    every output token's 7x7 window lives inside its 8x8 neighborhood.
    Returns ([B, N, 64c] tokens, feat_idx) mapping expanded slots to
    nn.Unfold (c, kh, kw) feature rows, or (None, None) if the geometry
    doesn't apply."""
    b, hgt, wdt, c = x.shape
    if hgt != wdt or hgt % 4:
        return None, None
    oh = hgt // 4
    xp = jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, 0)))
    gsz = (hgt + 8) // 4
    s2d = xp.reshape(b, gsz, 4, gsz, 4, c).transpose(0, 1, 3, 2, 4, 5)         .reshape(b, gsz, gsz, 16 * c)
    pieces = [jax.lax.slice(s2d, (0, bi, bj, 0),
                            (b, bi + oh, bj + oh, 16 * c))
              for bi in range(2) for bj in range(2)]
    nb = jnp.concatenate(pieces, axis=-1).reshape(b, oh * oh, 64 * c)
    idx = np.full((64 * c,), -1, np.int32)
    for bi in range(2):
        for bj in range(2):
            for r4 in range(4):
                for c4 in range(4):
                    ki, kj = bi * 4 + r4, bj * 4 + c4
                    if ki < 7 and kj < 7:
                        for ch in range(c):
                            src = ((bi * 2 + bj) * 16 + r4 * 4 + c4) * c                                 + ch
                            idx[src] = ch * 49 + ki * 7 + kj
    return nb, idx
