"""Fused multi-head attention Pallas kernel (TPU).

The hot op of every backbone (reference computes it as four separate
torch ops + materialized [B,H,N,N] probabilities: model_distilled.py:
156-191).  On TPU the naive lowering writes the attention logits and
probabilities to HBM twice per layer (f32 [B,H,N,N] — for DeiT-Small at
batch 256 that is ~240 MB per direction per layer), which caps the forward
at <10% MXU utilization.  This kernel keeps the whole per-(batch, head)
attention problem resident in VMEM — flash-attention without tiling, since
N <= a few hundred for ViTs:

  forward:  logits = q k^T * scale (f32, MXU) -> masked softmax (VPU)
            -> probs @ v (MXU); only ctx [N, dh] leaves the chip
  backward: recompute probs from saved q,k,v, then the standard
            softmax/matmul VJP — again entirely in VMEM

Sequence is padded to a multiple of 128 lanes outside the kernel; padded
key rows are masked to -inf before the softmax, padded query rows produce
garbage that the caller slices off.  Numerics: f32 logits/softmax
accumulators (matching the reference's fp32 autocast softmax), bf16
matmul inputs.

Interpret mode runs automatically on CPU so unit tests exercise the same
code path (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: route the CPU dispatch to the fused kernels in interpret
# mode (lets CPU tests trace the exact kernel graph, e.g. to assert the
# remat replay DCEs the forward kernels); monkeypatched by tests
_FORCE_FUSED_INTERPRET = os.environ.get("UVC_FORCE_FUSED", "0") == "1"


def _env_group(name: str):
    """A/B experiment hook: force a kernel batch-group size, bypassing
    the VMEM budget estimate (UVC_ATTN_FWD_G / UVC_ATTN_BWD_G, plus
    UVC_MLP_FWD_G / UVC_MLP_BWD_G in ops/mlp.py).  Used for
    scripts/tpu_kernel_roofline.py sweeps; unset in production.  r3
    sweep result: the budget-chosen defaults are already optimal
    (larger groups fail Mosaic VMEM compile or measure slower)."""
    v = os.environ.get(name)
    return int(v) if v else None


def _pad_len(n: int) -> int:
    return -(-n // 128) * 128


def _pad_rows(n: int) -> int:
    """Sequence padding for the fused *layer* kernels.

    The sequence axis is a sublane dimension for every HBM-visible block
    ([N, D] activations) — only 16-alignment (bf16 tile) is required, not
    128: the [N, N] attention logits exist solely inside the kernel, where
    Mosaic pads the lane axis in registers.  For ViT's N=197 this cuts the
    padded row count from 256 (+30% on the dominant qkv/proj matmul rows)
    to 208 (+5.6%)."""
    return -(-n // 16) * 16


def _compiler_params():
    """Grid programs are independent across the batch — declare the grid
    dimension parallel so Mosaic can overlap program epilogues (~5%)."""
    try:
        return {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("parallel",))}
    except (TypeError, AttributeError):    # API drift: run without the hint
        return {}


def _group(b: int, heads: int, n_blocks: int) -> int:
    """Batch items per program: larger blocks amortize per-program
    overhead (measured ~25% faster than one item per program on v5e), but
    the per-program VMEM footprint scales with group*heads*n_blocks and
    must stay under the ~16M scoped limit (double-buffered block DMA +
    f32 logits temporaries).  Budget calibrated on v5e: group*heads <= 24
    for the 4-block forward, halved for the 7-block backward."""
    budget_gh = max(1, 96 // n_blocks)   # fwd(4 blocks): 24; bwd(7): 13
    for g in (4, 2):
        if b % g == 0 and g * heads <= budget_gh:
            return g
    return 1


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int,
                heads: int, group: int):
    np_ = q_ref.shape[-2]
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    # additive key-padding bias (one fused add beats a select pass)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    for g in range(group):
        for h in range(heads):
            q = q_ref[g, h].astype(jnp.bfloat16)
            k = k_ref[g, h].astype(jnp.bfloat16)
            v = v_ref[g, h].astype(jnp.bfloat16)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            # normalization folded past the second matmul: dividing the
            # [N, dh] context is 4x less VPU work than the [N, N] probs
            ctx = jnp.dot(p.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32) / s
            o_ref[g, h] = ctx.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, n_valid: int, heads: int, group: int):
    np_ = q_ref.shape[-2]
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    for g in range(group):
        for h in range(heads):
            q = q_ref[g, h].astype(jnp.bfloat16)
            k = k_ref[g, h].astype(jnp.bfloat16)
            v = v_ref[g, h].astype(jnp.bfloat16)
            do = do_ref[g, h].astype(jnp.bfloat16)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            probs = p / s                                 # f32 [N, N]
            pb = probs.astype(jnp.bfloat16)
            # dv = probs^T @ do
            dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # dp = do @ v^T
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # softmax vjp: ds = probs * (dp - rowsum(dp * probs))
            row = jnp.sum(dp * probs, axis=-1, keepdims=True)
            ds = (probs * (dp - row)).astype(jnp.bfloat16)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scale
            dq_ref[g, h] = dq.astype(dq_ref.dtype)
            dk_ref[g, h] = dk.astype(dk_ref.dtype)
            dv_ref[g, h] = dv.astype(dv_ref.dtype)


def _bwd_ctx_kernel(q_ref, k_ref, v_ref, do_ref, ctx_ref, dq_ref, dk_ref,
                    dv_ref, *, scale: float, n_valid: int, heads: int,
                    group: int):
    """Backward that also emits the forward context.

    The fused-layer VJP needs ctx (for the proj-weight and mask grads) in
    addition to dq/dk/dv.  The backward already recomputes the softmax, so
    ctx costs one extra [N,N]x[N,dh] matmul here — strictly cheaper than a
    separate forward kernel run (which repeats qk^T and the softmax too).
    """
    np_ = q_ref.shape[-2]
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    for g in range(group):
        for h in range(heads):
            q = q_ref[g, h].astype(jnp.bfloat16)
            k = k_ref[g, h].astype(jnp.bfloat16)
            v = v_ref[g, h].astype(jnp.bfloat16)
            do = do_ref[g, h].astype(jnp.bfloat16)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            probs = p / s                                 # f32 [N, N]
            pb = probs.astype(jnp.bfloat16)
            ctx = jnp.dot(pb, v, preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            row = jnp.sum(dp * probs, axis=-1, keepdims=True)
            ds = (probs * (dp - row)).astype(jnp.bfloat16)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scale
            ctx_ref[g, h] = ctx.astype(ctx_ref.dtype)
            dq_ref[g, h] = dq.astype(dq_ref.dtype)
            dk_ref[g, h] = dk.astype(dk_ref.dtype)
            dv_ref[g, h] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _call_fwd(q, k, v, scale: float, n_valid: int, interpret: bool = False):
    b, h, np_, dh = q.shape
    g = _group(b, h, 4)
    spec = pl.BlockSpec((g, h, np_, dh), lambda i: (i, 0, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid,
                          heads=h, group=g),
        grid=(b // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, np_, dh), q.dtype),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(q, k, v)


def _call_bwd(q, k, v, do, scale: float, n_valid: int,
              interpret: bool = False):
    b, h, np_, dh = q.shape
    g = _group(b, h, 7)
    spec = pl.BlockSpec((g, h, np_, dh), lambda i: (i, 0, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, h, np_, dh), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n_valid,
                          heads=h, group=g),
        grid=(b // g,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(q, k, v, do)


def _call_bwd_ctx(q, k, v, do, scale: float, n_valid: int,
                  interpret: bool = False):
    b, h, np_, dh = q.shape
    g = _group(b, h, 8)
    spec = pl.BlockSpec((g, h, np_, dh), lambda i: (i, 0, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, h, np_, dh), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_ctx_kernel, scale=scale, n_valid=n_valid,
                          heads=h, group=g),
        grid=(b // g,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec, spec),
        out_shape=(shape, shape, shape, shape),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_padded(q, k, v, scale: float, n_valid: int, interpret: bool):
    return _call_fwd(q, k, v, scale, n_valid, interpret)


def _attention_padded_fwd(q, k, v, scale, n_valid, interpret):
    return _call_fwd(q, k, v, scale, n_valid, interpret), (q, k, v)


def _attention_padded_bwd(scale, n_valid, interpret, res, do):
    q, k, v = res
    dq, dk, dv = _call_bwd(q, k, v, do, scale, n_valid, interpret)
    return dq, dk, dv


_attention_padded.defvjp(_attention_padded_fwd, _attention_padded_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float, *, interpret: bool = False) -> jax.Array:
    """softmax(q k^T * scale) v with [B, H, N, dh] inputs, any N.

    Pads N to a lane multiple, masks padded keys, runs the fused kernel,
    slices the result back.  Differentiable (custom VJP, fused backward).
    """
    b, h, n, dh = q.shape
    np_ = _pad_len(n)
    if np_ != n:
        pad = ((0, 0), (0, 0), (0, np_ - n), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    out = _attention_padded(q, k, v, float(scale), n, interpret)
    return out[:, :, :n, :]


def reference_attention(q, k, v, scale: float) -> jax.Array:
    """Naive jnp attention — the CPU/test fallback and the numerical oracle
    for the kernel (same f32 softmax, bf16 matmul layout)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention_core(q, k, v, scale: float) -> jax.Array:
    """Backend dispatch: fused Pallas kernel on accelerators, naive jnp on
    host CPU (interpret-mode Pallas is far too slow for the test suite;
    dedicated kernel tests cover interpret mode on tiny shapes)."""
    if jax.default_backend() == "cpu":
        return reference_attention(q, k, v, scale)
    return fused_attention(q, k, v, scale)


# ---------------------------------------------------------------------------
# fused layer kernel: qkv matmul + attention + (masked) proj in one program
# ---------------------------------------------------------------------------


def _layer_group(b: int, d: int, np_: int, ln: bool = False) -> int:
    """VMEM budget for the layer kernel: x/out blocks scale with group,
    weights (wqkv + wproj ~ 4*d*d*2B) are resident once."""
    forced = _env_group("UVC_ATTN_FWD_G")
    if forced:
        return forced
    weights = 4 * d * d * 2
    # g=8 fits narrow widths (DeiT-Tiny) only: at D=384 the double-buffered
    # in+out block DMA alone reaches the 16M scoped-vmem limit (measured
    # 16.07M, 68K over — invariant to scratch shaving)
    for g in (8, 4, 2, 1):
        if b % g != 0:
            continue
        blocks = 2 * g * np_ * d * 2 * 2       # x+out, double-buffered
        # qkv + ctx live for the whole group (flattened matmuls) + f32
        # logits temporaries
        scratch = g * np_ * 4 * d * 2 + np_ * np_ * 4 * 2
        if ln:
            # the LN-fused forward also keeps the f32 x copy (residual +
            # LN statistics) for the whole group
            scratch += g * np_ * d * 4
        if weights + blocks + scratch < 12 * 1024 * 1024:
            return g
    return 1


def _layer_fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                      mask_ref, o_ref, *, scale: float, n_valid: int,
                      heads: int, group: int, d: int):
    # d here is the ATTENTION width (wqkv out // 3); the model width is
    # x_ref's last dim — they differ for compacted serving models
    np_ = x_ref.shape[-2]
    dm = x_ref.shape[-1]
    dh = d // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    # qkv/proj matmuls run flattened over the whole batch group ([g*N, D]
    # rows amortize MXU pipeline fill better than g separate [N, D] calls);
    # only the per-head attention core loops
    x_all = x_ref[...].reshape(group * np_, dm)
    qkv = (jnp.dot(x_all, wqkv_ref[...],
                   preferred_element_type=jnp.float32)
           + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = qkv.reshape(group, np_, 3 * d)
    ctxs = []
    for g in range(group):
        for h in range(heads):
            q = qkv[g, :, h * dh:(h + 1) * dh]
            k = qkv[g, :, d + h * dh:d + (h + 1) * dh]
            v = qkv[g, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            ctxs.append(jnp.dot(p.astype(jnp.bfloat16), v,
                                preferred_element_type=jnp.float32) / s)
    ctx = jnp.concatenate(
        [jnp.concatenate(ctxs[g * heads:(g + 1) * heads], axis=-1)
         for g in range(group)], axis=0).astype(jnp.bfloat16)
    ctx = ctx * mask_ref[...].astype(jnp.bfloat16)      # [g*N, d]
    out = jnp.dot(ctx, wproj_ref[...],
                  preferred_element_type=jnp.float32) \
        + bproj_ref[...].astype(jnp.float32)
    o_ref[...] = out.reshape(group, np_, -1).astype(o_ref.dtype)


def fused_layer_attention(x, wqkv, bqkv, wproj, bproj, mask, *,
                          num_heads: int, scale: float,
                          interpret: bool = False):
    """One transformer attention sublayer — qkv projection, multi-head
    softmax attention, structural ctx mask, output projection — as a
    single Pallas program.  The qkv activations and attention
    probabilities never touch HBM, and the weights stay VMEM-resident
    across the batch grid (constant index_map): measured ~45% faster than
    XLA-matmul + fused-core + XLA-matmul on v5e.

    x: [B, N, D] (any N); mask: [D] structural keep mask over ctx columns
    (pass ones when unmasked).  Differentiable via a composed VJP: the
    backward recomputes qkv with one XLA matmul and runs a single combined
    Pallas program that recomputes the softmax once and emits ctx + dq/dk/dv
    (no separate forward re-run).
    """
    b, n, _ = x.shape
    np_ = _pad_rows(n)
    if np_ != n:
        x = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    out = _fused_layer(x, wqkv, bqkv, wproj, bproj, mask,
                       float(scale), n, num_heads, interpret)
    return out[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_layer(x, wqkv, bqkv, wproj, bproj, mask, scale, n_valid,
                 num_heads, interpret):
    b, np_, dm = x.shape              # model width
    da = wqkv.shape[1] // 3           # attention width (== dm pre-compact)
    g = _layer_group(b, max(dm, da), np_)
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=mspace)
    ospec = pl.BlockSpec((g, np_, wproj.shape[1]), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    return pl.pallas_call(
        functools.partial(_layer_fwd_kernel, scale=scale, n_valid=n_valid,
                          heads=num_heads, group=g, d=da),
        grid=(b // g,),
        in_specs=[xspec, wspec((dm, 3 * da)), wspec((3 * da,)),
                  wspec((da, wproj.shape[1])), wspec((wproj.shape[1],)),
                  wspec((da,))],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, np_, wproj.shape[1]), x.dtype),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(x, wqkv, bqkv, wproj, bproj, mask)


def _layer_bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, mask_ref, do_ref,
                      dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                      dmask_ref, *, scale: float, n_valid: int, heads: int,
                      group: int, d: int):
    """Whole attention-sublayer backward in one program.

    Recomputes qkv and the softmax in VMEM (weights are grid-resident), and
    accumulates the weight/bias/mask grads across the sequential grid into
    f32 output blocks (constant index_map -> the accumulators stay in VMEM
    for the whole grid and are written back once).  Replaces ~10 XLA ops
    whose [B,N,3D]-sized stack/transpose relayouts dominated the composed
    backward's runtime (measured: the composed path moved >6x more HBM
    traffic than the math requires).

    Padded rows are correct by construction: x and dout padded rows are
    zero (pad + slice-VJP), so every accumulated product they touch is zero,
    and padded keys are masked from the softmax via the -1e30 bias.
    """
    np_ = x_ref.shape[-2]
    dh = d // heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dmask_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    maskv = mask_ref[...].astype(jnp.float32)
    for g in range(group):
        xb = x_ref[g].astype(jnp.bfloat16)
        do = do_ref[g].astype(jnp.bfloat16)
        qkv = (jnp.dot(xb, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
        t = jax.lax.dot_general(do, wproj_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dctx = (t * maskv).astype(jnp.bfloat16)       # [N, D]
        ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
        for h in range(heads):
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, d + h * dh:d + (h + 1) * dh]
            v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            doh = dctx[:, h * dh:(h + 1) * dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            probs = p / s
            pb = probs.astype(jnp.bfloat16)
            ctx_parts.append(jnp.dot(pb, v,
                                     preferred_element_type=jnp.float32))
            dv_parts.append(jax.lax.dot_general(
                pb, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            row = jnp.sum(dp * probs, axis=-1, keepdims=True)
            ds = (probs * (dp - row)).astype(jnp.bfloat16)
            dq_parts.append(
                jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale)
            dk_parts.append(jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        ctx = jnp.concatenate(ctx_parts, axis=-1)      # [N, D] f32
        dqkv = jnp.concatenate(
            [jnp.concatenate(dq_parts, axis=-1),
             jnp.concatenate(dk_parts, axis=-1),
             jnp.concatenate(dv_parts, axis=-1)], axis=-1) \
            .astype(jnp.bfloat16)                      # [N, 3D]
        dx_ref[g] = jax.lax.dot_general(
            dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        dwqkv_ref[...] += jax.lax.dot_general(
            xb, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                  keepdims=True)
        dwproj_ref[...] += jax.lax.dot_general(
            (ctx * maskv).astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbproj_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0,
                                   keepdims=True)
        dmask_ref[...] += jnp.sum(t * ctx, axis=0, keepdims=True)


def _layer_bwd_group(b: int, d: int, dg: int, np_: int) -> Optional[int]:
    """Batch group for the fused sublayer backward over a head group of
    width ``dg`` (== d when unsplit), or None when the f32 weight-grad
    accumulators + weights + block DMA don't fit the ~13M VMEM budget."""
    weights = 4 * d * dg * 2                # wqkv_g + wproj_g, bf16, resident
    accums = 4 * d * dg * 4                 # dwqkv_g + dwproj_g, f32, resident
    scratch = (np_ * 3 * dg * 2 * 2         # qkv + dqkv, bf16
               + np_ * dg * 10              # t (f32) + dctx (bf16) + ctx (f32)
               + 3 * np_ * np_ * 4)         # logits/probs/dp, f32
    for g in (4, 2, 1):
        if b % g:
            continue
        blocks = 3 * g * np_ * d * 2 * 2    # x, do, dx double-buffered
        if weights + accums + scratch + blocks < 13 * 1024 * 1024:
            return g
    return None


def _head_group_split(b: int, d: int, num_heads: int, np_: int):
    """Smallest head-group count whose per-group backward fits VMEM.
    Returns (n_groups, batch_group) or (None, None) -> composed fallback."""
    for ng in (1, 2, 4):
        if num_heads % ng:
            continue
        if ng > 1 and (d // ng) % 128:
            continue                 # split groups stay lane-aligned
        g = _layer_bwd_group(b, d, d // ng, np_)
        if g is not None:
            return ng, g
    return None, None


def _call_layer_bwd(x, wqkv, bqkv, wproj, mask, do, scale, n_valid,
                    num_heads, g, interpret=False):
    b, np_, d = x.shape                # model width
    dg = wqkv.shape[1] // 3            # head-group width (== d unsplit)
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((g, np_, d), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    f32 = jnp.float32
    # the accumulator outputs use a constant index_map: the grid revisits
    # the same block every step, so Mosaic keeps it VMEM-resident for the
    # whole (sequential) grid and writes back once — do NOT mark the grid
    # parallel here
    return pl.pallas_call(
        functools.partial(_layer_bwd_kernel, scale=scale, n_valid=n_valid,
                          heads=num_heads, group=g, d=dg),
        grid=(b // g,),
        in_specs=[xspec, cspec((d, 3 * dg)), cspec((3 * dg,)),
                  cspec((dg, d)), cspec((dg,)), xspec],
        out_specs=(xspec, cspec((d, 3 * dg)), cspec((1, 3 * dg)),
                   cspec((dg, d)), cspec((1, d)), cspec((1, dg))),
        out_shape=(jax.ShapeDtypeStruct((b, np_, d), x.dtype),
                   jax.ShapeDtypeStruct((d, 3 * dg), f32),
                   jax.ShapeDtypeStruct((1, 3 * dg), f32),
                   jax.ShapeDtypeStruct((dg, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, dg), f32)),
        interpret=interpret,
    )(x, wqkv, bqkv, wproj, mask, do)


def _fused_layer_fwd(x, wqkv, bqkv, wproj, bproj, mask, scale, n_valid,
                     num_heads, interpret):
    out = _fused_layer(x, wqkv, bqkv, wproj, bproj, mask, scale, n_valid,
                       num_heads, interpret)
    return out, (x, wqkv, bqkv, wproj, bproj, mask)


def _fused_layer_bwd(scale, n_valid, num_heads, interpret, res, dout):
    x, wqkv, bqkv, wproj, bproj, mask = res
    b, np_, d = x.shape
    da = wqkv.shape[1] // 3           # attention width: != d for the
    dh = da // num_heads              # compact stage-2 training layers
    if da != d:
        # rectangular widths (train/compact_ft.py): the combined backward
        # kernel and its call wrapper are already width-generic — the
        # head-group-split path below feeds them rectangular [d, 3*dg]
        # slices — so run the whole-sublayer kernel directly at the
        # compact width when its accumulators fit VMEM, else fall through
        # to the composed path (which still keeps the softmax recompute +
        # dq/dk/dv in the _bwd_ctx kernel)
        ng, g = (1, _layer_bwd_group(b, d, da, np_))
        if g is None:
            ng = None
    else:
        ng, g = _head_group_split(b, d, num_heads, np_)
    if ng == 1:
        # whole-sublayer backward in one Pallas program: qkv + softmax
        # recomputed in VMEM, weight grads accumulated across the grid —
        # no [B,N,3D] relayouts or pad copies touch HBM at all
        dx, dwqkv, dbqkv, dwproj, dbproj, dmask = _call_layer_bwd(
            x, wqkv, bqkv, wproj, mask, dout, scale, n_valid, num_heads,
            g, interpret)
        return (dx, dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj[0].astype(bproj.dtype),
                dmask[0].astype(mask.dtype))
    if ng is not None:
        # wide models (DeiT-Base): the sublayer backward decomposes
        # exactly by head group — dwqkv columns, dwproj rows, the dctx
        # slice and the qkv recompute all partition by head — so run the
        # same kernel per group (d -> d/ng) and let XLA sum the partial
        # dx.  Costs ng-1 extra reads of x/dout vs the unsplit kernel;
        # still far below the composed path's relayout traffic.
        dg = d // ng
        parts = []
        for i in range(ng):
            lo, hi = i * dg, (i + 1) * dg
            wq_g = jnp.concatenate(
                [wqkv[:, lo:hi], wqkv[:, d + lo:d + hi],
                 wqkv[:, 2 * d + lo:2 * d + hi]], axis=1)
            bq_g = jnp.concatenate(
                [bqkv[lo:hi], bqkv[d + lo:d + hi],
                 bqkv[2 * d + lo:2 * d + hi]])
            parts.append(_call_layer_bwd(
                x, wq_g, bq_g, wproj[lo:hi, :], mask[lo:hi], dout,
                scale, n_valid, num_heads // ng, g, interpret))
        dx = parts[0][0]
        for p in parts[1:]:
            dx = dx + p[0]
        dwqkv = jnp.concatenate(
            [p[1][:, :dg] for p in parts]
            + [p[1][:, dg:2 * dg] for p in parts]
            + [p[1][:, 2 * dg:] for p in parts], axis=1)
        dbqkv = jnp.concatenate(
            [p[2][0, :dg] for p in parts]
            + [p[2][0, dg:2 * dg] for p in parts]
            + [p[2][0, 2 * dg:] for p in parts])
        dwproj = jnp.concatenate([p[3] for p in parts], axis=0)
        dmask = jnp.concatenate([p[5][0] for p in parts])
        return (dx.astype(x.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                parts[0][4][0].astype(bproj.dtype), dmask.astype(mask.dtype))
    # composed fallback (wide models whose f32 weight-grad accumulators
    # don't fit VMEM, and all rectangular compact-training layers):
    # recompute qkv with one XLA matmul; the attention forward is NOT
    # re-run — the combined kernel below recomputes the softmax once and
    # emits ctx
    qkv = (x @ wqkv + bqkv).reshape(b, np_, 3, num_heads, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

    dout32 = dout.astype(jnp.float32)
    dbproj = jnp.sum(dout32, axis=(0, 1)).astype(bproj.dtype)
    dctx2 = (dout @ wproj.T) * mask
    dctx = dctx2.reshape(b, np_, num_heads, dh).transpose(0, 2, 1, 3)
    ctx, dq, dk, dv = _call_bwd_ctx(q, k, v, dctx.astype(q.dtype), scale,
                                    n_valid, interpret)
    ctx_flat = ctx.transpose(0, 2, 1, 3).reshape(b, np_, da)
    dwproj = jnp.einsum(
        "bnd,bne->de", (ctx_flat * mask).astype(jnp.float32),
        dout32).astype(wproj.dtype)
    dmask = jnp.sum(
        dout32 @ wproj.astype(jnp.float32).T
        * ctx_flat.astype(jnp.float32),
        axis=(0, 1)).astype(mask.dtype)
    dqkv = jnp.stack([dq, dk, dv], axis=2)            # [B, H, 3, N, dh]
    dqkv = dqkv.transpose(0, 3, 2, 1, 4).reshape(b, np_, 3 * da)
    dx = dqkv @ wqkv.T
    dwqkv = jnp.einsum("bnd,bne->de", x.astype(jnp.float32),
                       dqkv.astype(jnp.float32)).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)) \
        .astype(bqkv.dtype)
    return (dx.astype(x.dtype), dwqkv, dbqkv, dwproj, dbproj, dmask)


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def layer_attention(x, wqkv, bqkv, wproj, bproj, mask, *, num_heads: int,
                    scale: float):
    """Backend dispatch for the full attention sublayer: fused Pallas
    program on accelerators, plain composition on CPU."""
    if jax.default_backend() == "cpu":
        b, n, _ = x.shape
        da = wqkv.shape[1] // 3       # attention width (!= model width
        dh = da // num_heads          # for compacted serving layers)
        qkv = (x @ wqkv + bqkv).reshape(b, n, 3, num_heads, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        ctx = reference_attention(q, k, v, scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, da) * mask
        return ctx @ wproj + bproj
    return fused_layer_attention(x, wqkv, bqkv, wproj, bproj, mask,
                                 num_heads=num_heads, scale=scale)


# ---------------------------------------------------------------------------
# LN-fused sublayer: LN1 + qkv + attention + mask + proj + residual add,
# one program each way
# ---------------------------------------------------------------------------


def _ln_rows(x32, gamma, beta, eps):
    """Row layernorm in f32 (inside-kernel twin of models/vit._layer_norm).
    Returns (a_in_f32, xhat, inv) — xhat/inv feed the backward."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * gamma + beta, xhat, inv


def _layer_ln_fwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, bproj_ref, mask_ref, o_ref, *,
                         scale: float, n_valid: int, heads: int, group: int,
                         d: int, eps: float):
    """out = x + proj(attn(LN(x))) in one program.

    vs _layer_fwd_kernel this absorbs the two remaining per-sublayer XLA
    elementwise passes (LN1 and the residual add) — each a full [B, N, D]
    HBM round trip (the cost VERDICT r2 flagged: models/vit.py:356-380).
    The LN is VPU work on rows already resident in VMEM.  Padded rows
    produce garbage LN outputs (LN(0)=beta) whose attention output the
    caller slices off; padded keys are bias-masked as before."""
    np_ = x_ref.shape[-2]
    dm = x_ref.shape[-1]
    dh = d // heads
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    x32 = x_ref[...].reshape(group * np_, dm).astype(jnp.float32)
    a_in, _, _ = _ln_rows(x32, g1_ref[...].astype(jnp.float32),
                          b1_ref[...].astype(jnp.float32), eps)
    a_in = a_in.astype(jnp.bfloat16)
    qkv = (jnp.dot(a_in, wqkv_ref[...],
                   preferred_element_type=jnp.float32)
           + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = qkv.reshape(group, np_, 3 * d)
    ctxs = []
    for g in range(group):
        for h in range(heads):
            q = qkv[g, :, h * dh:(h + 1) * dh]
            k = qkv[g, :, d + h * dh:d + (h + 1) * dh]
            v = qkv[g, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            ctxs.append(jnp.dot(p.astype(jnp.bfloat16), v,
                                preferred_element_type=jnp.float32) / s)
    ctx = jnp.concatenate(
        [jnp.concatenate(ctxs[g * heads:(g + 1) * heads], axis=-1)
         for g in range(group)], axis=0).astype(jnp.bfloat16)
    ctx = ctx * mask_ref[...].astype(jnp.bfloat16)
    out = jnp.dot(ctx, wproj_ref[...],
                  preferred_element_type=jnp.float32) \
        + bproj_ref[...].astype(jnp.float32)
    o_ref[...] = (x32 + out).reshape(group, np_, dm).astype(o_ref.dtype)


def _layer_ln_bwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, mask_ref, do_ref, dx_ref, dg1_ref,
                         db1_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                         dbproj_ref, dmask_ref, *, scale: float,
                         n_valid: int, heads: int, group: int, d: int,
                         eps: float):
    """Whole LN+attention-sublayer+residual backward in one program.

    Extends _layer_bwd_kernel with the LN recompute and its VJP:
      dz = inv * (dy*g - mean(dy*g) - xhat*mean(dy*g*xhat)) + dout
    (the +dout is the residual path), with dg1/db1 joining the weight-grad
    f32 accumulators (constant index_map -> sequential grid, see
    _call_layer_bwd).  Padded x/dout rows are zero, so LN of a padded row
    is beta with zero upstream grad — every accumulated term they touch
    vanishes."""
    np_ = x_ref.shape[-2]
    dm = x_ref.shape[-1]
    dh = d // heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                    dbproj_ref, dmask_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
    maskv = mask_ref[...].astype(jnp.float32)
    gamma = g1_ref[...].astype(jnp.float32)
    beta = b1_ref[...].astype(jnp.float32)
    for g in range(group):
        x32 = x_ref[g].astype(jnp.float32)
        a32, xhat, inv = _ln_rows(x32, gamma, beta, eps)
        a_in = a32.astype(jnp.bfloat16)
        do = do_ref[g].astype(jnp.bfloat16)
        qkv = (jnp.dot(a_in, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
        t = jax.lax.dot_general(do, wproj_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dctx = (t * maskv).astype(jnp.bfloat16)
        ctx_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
        for h in range(heads):
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, d + h * dh:d + (h + 1) * dh]
            v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            doh = dctx[:, h * dh:(h + 1) * dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + bias
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            probs = p / s
            pb = probs.astype(jnp.bfloat16)
            ctx_parts.append(jnp.dot(pb, v,
                                     preferred_element_type=jnp.float32))
            dv_parts.append(jax.lax.dot_general(
                pb, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            row = jnp.sum(dp * probs, axis=-1, keepdims=True)
            ds = (probs * (dp - row)).astype(jnp.bfloat16)
            dq_parts.append(
                jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale)
            dk_parts.append(jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        ctx = jnp.concatenate(ctx_parts, axis=-1)
        dqkv = jnp.concatenate(
            [jnp.concatenate(dq_parts, axis=-1),
             jnp.concatenate(dk_parts, axis=-1),
             jnp.concatenate(dv_parts, axis=-1)], axis=-1) \
            .astype(jnp.bfloat16)
        da = jax.lax.dot_general(
            dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # d a_in [N, dm]
        dg = da * gamma
        m1 = jnp.mean(dg, axis=-1, keepdims=True)
        m2 = jnp.mean(dg * xhat, axis=-1, keepdims=True)
        dz = (dg - m1 - xhat * m2) * inv
        dx_ref[g] = (dz + do_ref[g].astype(jnp.float32)) \
            .astype(dx_ref.dtype)
        dg1_ref[...] += jnp.sum(da * xhat, axis=0, keepdims=True)
        db1_ref[...] += jnp.sum(da, axis=0, keepdims=True)
        dwqkv_ref[...] += jax.lax.dot_general(
            a_in, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                  keepdims=True)
        dwproj_ref[...] += jax.lax.dot_general(
            (ctx * maskv).astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbproj_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0,
                                   keepdims=True)
        dmask_ref[...] += jnp.sum(t * ctx, axis=0, keepdims=True)


def _layer_ln_bwd_group(b: int, d: int, np_: int,
                        da: Optional[int] = None) -> Optional[int]:
    """VMEM budget for the LN-fused backward: the _layer_bwd_group
    estimate plus the LN's f32 row temporaries (x32/xhat/da/dz) and the
    dg1/db1 accumulators.  ``da`` is the attention width (== d for the
    square training layers; smaller for compact stage-2 layers)."""
    forced = _env_group("UVC_ATTN_BWD_G")
    if forced:
        return forced
    da = d if da is None else da
    weights = 4 * d * da * 2
    accums = 4 * d * da * 4 + 2 * d * 4
    scratch = (np_ * 3 * da * 2 * 2
               + np_ * da * 10
               + 3 * np_ * np_ * 4
               + 4 * np_ * d * 4)              # LN f32 temporaries
    # g=8 reachable for narrow widths (DeiT-Tiny) — halves the number of
    # sequential grid steps over the accumulators
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = 3 * g * np_ * d * 2 * 2
        if weights + accums + scratch + blocks < 13 * 1024 * 1024:
            return g
    return None


def _call_layer_ln_fwd(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, scale,
                       n_valid, num_heads, eps, interpret=False):
    b, np_, dm = x.shape
    da = wqkv.shape[1] // 3
    g = _layer_group(b, max(dm, da), np_, ln=True)
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    return pl.pallas_call(
        functools.partial(_layer_ln_fwd_kernel, scale=scale,
                          n_valid=n_valid, heads=num_heads, group=g, d=da,
                          eps=eps),
        grid=(b // g,),
        in_specs=[xspec, wspec((dm,)), wspec((dm,)), wspec((dm, 3 * da)),
                  wspec((3 * da,)), wspec((da, dm)), wspec((dm,)),
                  wspec((da,))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, np_, dm), x.dtype),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(x, g1, b1, wqkv, bqkv, wproj, bproj, mask)


def _call_layer_ln_bwd(x, g1, b1, wqkv, bqkv, wproj, mask, do, scale,
                       n_valid, num_heads, eps, g, interpret=False):
    b, np_, d = x.shape
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((g, np_, d), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    f32 = jnp.float32
    da = wqkv.shape[1] // 3           # attention width (== d unless the
    # layer is a compact stage-2 one — the kernel body is width-generic)
    # sequential grid + constant-index_map accumulators (see
    # _call_layer_bwd) — do NOT mark the grid parallel
    return pl.pallas_call(
        functools.partial(_layer_ln_bwd_kernel, scale=scale,
                          n_valid=n_valid, heads=num_heads, group=g, d=da,
                          eps=eps),
        grid=(b // g,),
        in_specs=[xspec, cspec((d,)), cspec((d,)), cspec((d, 3 * da)),
                  cspec((3 * da,)), cspec((da, d)), cspec((da,)), xspec],
        out_specs=(xspec, cspec((1, d)), cspec((1, d)), cspec((d, 3 * da)),
                   cspec((1, 3 * da)), cspec((da, d)), cspec((1, d)),
                   cspec((1, da))),
        out_shape=(jax.ShapeDtypeStruct((b, np_, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, 3 * da), f32),
                   jax.ShapeDtypeStruct((1, 3 * da), f32),
                   jax.ShapeDtypeStruct((da, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, da), f32)),
        interpret=interpret,
    )(x, g1, b1, wqkv, bqkv, wproj, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _fused_layer_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, scale,
                    n_valid, num_heads, eps, interpret):
    return _call_layer_ln_fwd(x, g1, b1, wqkv, bqkv, wproj, bproj, mask,
                              scale, n_valid, num_heads, eps, interpret)


def _fused_layer_ln_fwd(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, scale,
                        n_valid, num_heads, eps, interpret):
    out = _fused_layer_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, scale,
                          n_valid, num_heads, eps, interpret)
    return out, (x, g1, b1, wqkv, bqkv, wproj, bproj, mask)


def _fused_layer_ln_bwd(scale, n_valid, num_heads, eps, interpret, res,
                        dout):
    x, g1, b1, wqkv, bqkv, wproj, bproj, mask = res
    b, np_, d = x.shape
    # the kernel + wrapper are width-generic: rectangular (compact
    # stage-2 training) widths run the same single-program backward with
    # a smaller attention width, budget permitting
    g = _layer_ln_bwd_group(b, d, np_, wqkv.shape[1] // 3)
    if g is not None:
        dx, dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dmask = \
            _call_layer_ln_bwd(x, g1, b1, wqkv, bqkv, wproj, mask, dout,
                               scale, n_valid, num_heads, eps, g, interpret)
        return (dx, dg1[0].astype(g1.dtype), db1[0].astype(b1.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj[0].astype(bproj.dtype),
                dmask[0].astype(mask.dtype))
    # wide models whose accumulators don't fit: peel the LN off with an
    # XLA recompute and delegate to the plain sublayer backward (which
    # routes to the head-group-split kernel or the composed fallback)
    def ln_fn(xx, gg, bb):
        x32 = xx.astype(jnp.float32)
        y, _, _ = _ln_rows(x32, gg.astype(jnp.float32),
                           bb.astype(jnp.float32), eps)
        return y.astype(xx.dtype)

    a_in, ln_vjp = jax.vjp(ln_fn, x, g1, b1)
    da, dwqkv, dbqkv, dwproj, dbproj, dmask = _fused_layer_bwd(
        scale, n_valid, num_heads, interpret,
        (a_in, wqkv, bqkv, wproj, bproj, mask), dout)
    dx, dg1, db1 = ln_vjp(da)
    return (dx + dout.astype(dx.dtype), dg1, db1, dwqkv, dbqkv, dwproj,
            dbproj, dmask)


_fused_layer_ln.defvjp(_fused_layer_ln_fwd, _fused_layer_ln_bwd)


def fused_layer_attention_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, *,
                             num_heads: int, scale: float, eps: float,
                             interpret: bool = False):
    """x + proj(attn(LN(x; g1, b1))) as one Pallas program each way.

    The residual-gated variants (part gating, drop-path) keep the
    separate-LN path — their branch coefficients multiply the sublayer
    output before the add, which this fusion absorbs."""
    b, n, _ = x.shape
    np_ = _pad_rows(n)
    if np_ != n:
        x = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    out = _fused_layer_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask,
                          float(scale), n, num_heads, float(eps), interpret)
    return out[:, :n, :]


def layer_attention_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, *,
                       num_heads: int, scale: float, eps: float):
    """Backend dispatch for the LN-fused residual attention sublayer."""
    if jax.default_backend() == "cpu":
        if _FORCE_FUSED_INTERPRET:
            return fused_layer_attention_ln(
                x, g1, b1, wqkv, bqkv, wproj, bproj, mask,
                num_heads=num_heads, scale=scale, eps=eps, interpret=True)
        x32 = x.astype(jnp.float32)
        a_in, _, _ = _ln_rows(x32, g1.astype(jnp.float32),
                              b1.astype(jnp.float32), eps)
        a_out = layer_attention(a_in.astype(x.dtype), wqkv, bqkv, wproj,
                                bproj, mask, num_heads=num_heads,
                                scale=scale)
        return x + a_out
    return fused_layer_attention_ln(x, g1, b1, wqkv, bqkv, wproj, bproj,
                                    mask, num_heads=num_heads, scale=scale,
                                    eps=eps)
