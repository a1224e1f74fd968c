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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_len(n: int) -> int:
    return -(-n // 128) * 128


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


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _call_fwd(q, k, v, scale: float, n_valid: int, interpret: bool = False):
    b, h, np_, dh = q.shape
    g = _group(b, h, 4)
    spec = pl.BlockSpec((g, h, np_, dh), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
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
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
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
