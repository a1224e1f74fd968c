"""LN-fused MLP sublayer (LN2 + fc1 + GELU + mask + fc2 + residual) as
Pallas TPU kernels.

After the attention sublayer fused (ops/attention.py), the MLP became the
block's HBM-traffic leader: the XLA path reads/writes the [B, N, 4D]
hidden twice plus LN2 and the residual add — ~530 MB/block forward at
DeiT-Small B=256 vs ~82 MB for the fused attention.  Here the whole
sublayer runs as ONE program each way:

  forward:  out = x + ( gelu(LN(x) @ fc1 + b1) * mask ) @ fc2 + b2
            — the hidden activations never leave VMEM.
  backward: recomputes LN + fc1 + GELU in VMEM and accumulates the
            weight/LN/mask grads across a sequential grid into
            constant-index_map f32 blocks (same pattern as the attention
            sublayer backward); dx carries the residual term.

Under the block remat policy (models/vit.py: save "attn_out" = the
attention sublayer's residual sum, this op's input) the replay's forward
kernel is dead code (its output feeds nothing the VJP needs) and is
DCE'd, exactly like the attention forward.

GELU is the exact erf form (torch nn.GELU default, matching _mlp's
``approximate=False``) via the Abramowitz-Stegun polynomial — Mosaic has
no erf lowering; |err| < 1.5e-7, far below bf16 noise.

A/B switch: set UVC_FUSED_MLP=0 to fall back to the XLA composition
(models/vit.py reads this once at trace time).  Reference op being
replaced: model_distilled.py:100-126 (Mlp) inside Block :194-247.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvc_tpu.ops.attention import _compiler_params, _env_group, _pad_rows


def _erf(x):
    """Abramowitz-Stegun 7.1.26 (see ops/performer.py)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_and_grad(h32):
    phi = 0.5 * (1.0 + _erf(h32 / math.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * h32 * h32) / math.sqrt(2.0 * math.pi)
    return h32 * phi, phi + h32 * pdf


def _ln_rows(x32, gamma, beta, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * gamma + beta, xhat, inv


def _mlp_ln_fwd_kernel(x_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                       bfc2_ref, mask_ref, o_ref, *, group: int,
                       eps: float):
    np_ = x_ref.shape[-2]
    dm = x_ref.shape[-1]
    x32 = x_ref[...].reshape(group * np_, dm).astype(jnp.float32)
    m_in, _, _ = _ln_rows(x32, g2_ref[...].astype(jnp.float32),
                          b2_ref[...].astype(jnp.float32), eps)
    h = (jnp.dot(m_in.astype(jnp.bfloat16), wfc1_ref[...],
                 preferred_element_type=jnp.float32)
         + bfc1_ref[...].astype(jnp.float32))
    a, _ = _gelu_and_grad(h)
    a = a * mask_ref[...].astype(jnp.float32)
    out = (jnp.dot(a.astype(jnp.bfloat16), wfc2_ref[...],
                   preferred_element_type=jnp.float32)
           + bfc2_ref[...].astype(jnp.float32))
    o_ref[...] = (x32 + out).reshape(group, np_, dm).astype(o_ref.dtype)


def _mlp_ln_bwd_kernel(x_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                       mask_ref, do_ref, dx_ref, dg2_ref, db2_ref,
                       dwfc1_ref, dbfc1_ref, dwfc2_ref, dbfc2_ref,
                       dmask_ref, *, group: int, eps: float,
                       add_residual: bool = True):
    np_ = x_ref.shape[-2]
    dm = x_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dg2_ref, db2_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref,
                    dbfc2_ref, dmask_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    gamma = g2_ref[...].astype(jnp.float32)
    beta = b2_ref[...].astype(jnp.float32)
    maskv = mask_ref[...].astype(jnp.float32)
    for g in range(group):
        x32 = x_ref[g].astype(jnp.float32)
        m32, xhat, inv = _ln_rows(x32, gamma, beta, eps)
        m_in = m32.astype(jnp.bfloat16)
        h = (jnp.dot(m_in, wfc1_ref[...],
                     preferred_element_type=jnp.float32)
             + bfc1_ref[...].astype(jnp.float32))
        a, dgelu = _gelu_and_grad(h)
        am = (a * maskv).astype(jnp.bfloat16)
        do = do_ref[g].astype(jnp.bfloat16)
        do32 = do_ref[g].astype(jnp.float32)
        dam = jax.lax.dot_general(
            do, wfc2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [N, F]
        dmask_ref[...] += jnp.sum(dam * a, axis=0, keepdims=True)
        dh = dam * maskv * dgelu
        dh_b = dh.astype(jnp.bfloat16)
        dwfc2_ref[...] += jax.lax.dot_general(
            am, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbfc2_ref[...] += jnp.sum(do32, axis=0, keepdims=True)
        dwfc1_ref[...] += jax.lax.dot_general(
            m_in, dh_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbfc1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
        dmi = jax.lax.dot_general(
            dh_b, wfc1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [N, D]
        dg = dmi * gamma
        m1 = jnp.mean(dg, axis=-1, keepdims=True)
        m2 = jnp.mean(dg * xhat, axis=-1, keepdims=True)
        dz = (dg - m1 - xhat * m2) * inv
        # hidden-split calls add the residual in part 0 only (the LN vjp
        # is linear in dmi, so per-group dz sums exactly)
        dx_ref[g] = ((dz + do32) if add_residual else dz) \
            .astype(dx_ref.dtype)
        dg2_ref[...] += jnp.sum(dmi * xhat, axis=0, keepdims=True)
        db2_ref[...] += jnp.sum(dmi, axis=0, keepdims=True)


def _mlp_fwd_group(b: int, dm: int, f: int, np_: int) -> int:
    forced = _env_group("UVC_MLP_FWD_G")
    if forced:
        return forced
    weights = 2 * dm * f * 2                       # fc1 + fc2 bf16, resident
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = 2 * g * np_ * dm * 2 * 2          # x + out, double-buffered
        scratch = g * np_ * (dm * 4 + f * 4 * 2)   # m_in f32, h/a f32
        if weights + blocks + scratch < 12 * 1024 * 1024:
            return g
    return 1


def _mlp_bwd_group(b: int, dm: int, f: int, np_: int) -> Optional[int]:
    forced = _env_group("UVC_MLP_BWD_G")
    if forced:
        return forced
    weights = 2 * dm * f * 2
    accums = 2 * dm * f * 4 + (2 * dm + 2 * f) * 4
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = 3 * g * np_ * dm * 2 * 2          # x, do, dx
        scratch = (np_ * dm * 4 * 3                # x32/xhat/dmi
                   + np_ * f * 4 * 4               # h, a/dgelu, dam, dh
                   + np_ * f * 2 * 2)              # am, dh_b
        if weights + accums + scratch + blocks < 13 * 1024 * 1024:
            return g
    return None


def _call_mlp_fwd(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps,
                  interpret=False):
    b, np_, dm = x.shape
    f = wfc1.shape[1]
    g = _mlp_fwd_group(b, dm, f, np_)
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    return pl.pallas_call(
        functools.partial(_mlp_ln_fwd_kernel, group=g, eps=eps),
        grid=(b // g,),
        in_specs=[xspec, wspec((dm,)), wspec((dm,)), wspec((dm, f)),
                  wspec((f,)), wspec((f, dm)), wspec((dm,)), wspec((f,))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, np_, dm), x.dtype),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask)


def _call_mlp_bwd(x, g2, b2, wfc1, bfc1, wfc2, mask, do, eps, g,
                  interpret=False, add_residual=True):
    b, np_, dm = x.shape
    f = wfc1.shape[1]
    mspace = pl.ANY if interpret else pltpu.VMEM
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=mspace)

    f32 = jnp.float32
    # constant-index_map accumulators over a sequential grid (see
    # ops/attention.py _call_layer_bwd) — do NOT mark the grid parallel
    return pl.pallas_call(
        functools.partial(_mlp_ln_bwd_kernel, group=g, eps=eps,
                          add_residual=add_residual),
        grid=(b // g,),
        in_specs=[xspec, cspec((dm,)), cspec((dm,)), cspec((dm, f)),
                  cspec((f,)), cspec((f, dm)), cspec((f,)), xspec],
        out_specs=(xspec, cspec((1, dm)), cspec((1, dm)), cspec((dm, f)),
                   cspec((1, f)), cspec((f, dm)), cspec((1, dm)),
                   cspec((1, f))),
        out_shape=(jax.ShapeDtypeStruct((b, np_, dm), x.dtype),
                   jax.ShapeDtypeStruct((1, dm), f32),
                   jax.ShapeDtypeStruct((1, dm), f32),
                   jax.ShapeDtypeStruct((dm, f), f32),
                   jax.ShapeDtypeStruct((1, f), f32),
                   jax.ShapeDtypeStruct((f, dm), f32),
                   jax.ShapeDtypeStruct((1, dm), f32),
                   jax.ShapeDtypeStruct((1, f), f32)),
        interpret=interpret,
    )(x, g2, b2, wfc1, bfc1, wfc2, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps, interpret):
    return _call_mlp_fwd(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps,
                         interpret)


def _fused_mlp_ln_fwd(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps,
                      interpret):
    out = _fused_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps,
                        interpret)
    return out, (x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask)


def _composed_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps):
    """XLA composition (the CPU fallback and the wide-width bwd oracle);
    numerically the twin of models/vit.py _layer_norm + _mlp."""
    x32 = x.astype(jnp.float32)
    m_in, _, _ = _ln_rows(x32, g2.astype(jnp.float32),
                          b2.astype(jnp.float32), eps)
    m_in = m_in.astype(x.dtype)
    h = m_in @ wfc1 + bfc1
    h = jax.nn.gelu(h, approximate=False)
    h = h * mask
    return x + (h @ wfc2 + bfc2)


def _fused_mlp_ln_bwd(eps, interpret, res, dout):
    x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask = res
    b, np_, dm = x.shape
    f = wfc1.shape[1]
    g = _mlp_bwd_group(b, dm, f, np_)
    if g is not None:
        dx, dg2, db2, dwfc1, dbfc1, dwfc2, dbfc2, dmask = _call_mlp_bwd(
            x, g2, b2, wfc1, bfc1, wfc2, mask, dout, eps, g, interpret)
        return (dx, dg2[0].astype(g2.dtype), db2[0].astype(b2.dtype),
                dwfc1.astype(wfc1.dtype), dbfc1[0].astype(bfc1.dtype),
                dwfc2.astype(wfc2.dtype), dbfc2[0].astype(bfc2.dtype),
                dmask[0].astype(mask.dtype))
    # hidden-group split: the backward decomposes exactly by hidden units
    # (fc1 columns / fc2 rows / mask slices partition; dmi and the LN vjp
    # are linear in the per-group contributions) with NO duplicated
    # matmul work — each group projects only its own fc1 columns; only
    # the LN recompute and the x/do block reads repeat per group.  This
    # is how DeiT-Small (f=1536: accums+scratch overflow the unsplit
    # budget) and DeiT-Base (f=3072) keep the fused backward.
    for ng in (2, 4, 8):
        if f % ng == 0 and (f // ng) % 128 == 0:
            gi = _mlp_bwd_group(b, dm, f // ng, np_)
            if gi is not None:
                break
    else:
        gi = None
    if gi is None:
        # last resort: plain autodiff through the XLA composition
        _, vjp = jax.vjp(
            lambda *a: _composed_mlp_ln(*a, eps), x, g2, b2, wfc1, bfc1,
            wfc2, bfc2, mask)
        return vjp(dout)
    fg = f // ng
    parts = []
    for i in range(ng):
        lo, hi = i * fg, (i + 1) * fg
        parts.append(_call_mlp_bwd(
            x, g2, b2, wfc1[:, lo:hi], bfc1[lo:hi], wfc2[lo:hi, :],
            mask[lo:hi], dout, eps, gi, interpret,
            add_residual=(i == 0)))
    dx = parts[0][0]
    dg2 = parts[0][1]
    db2 = parts[0][2]
    for p in parts[1:]:
        dx = dx + p[0]
        dg2 = dg2 + p[1]
        db2 = db2 + p[2]
    dwfc1 = jnp.concatenate([p[3] for p in parts], axis=1)
    dbfc1 = jnp.concatenate([p[4][0] for p in parts])
    dwfc2 = jnp.concatenate([p[5] for p in parts], axis=0)
    dmask = jnp.concatenate([p[7][0] for p in parts])
    return (dx.astype(x.dtype), dg2[0].astype(g2.dtype),
            db2[0].astype(b2.dtype), dwfc1.astype(wfc1.dtype),
            dbfc1.astype(bfc1.dtype), dwfc2.astype(wfc2.dtype),
            parts[0][6][0].astype(bfc2.dtype), dmask.astype(mask.dtype))


_fused_mlp_ln.defvjp(_fused_mlp_ln_fwd, _fused_mlp_ln_bwd)


def fused_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, *, eps: float,
                 interpret: bool = False):
    """x + (gelu(LN(x; g2, b2) @ fc1) * mask) @ fc2 as one program each
    way.  ``mask`` is the [F] structural MLP-unit keep mask (ones when
    unmasked)."""
    b, n, _ = x.shape
    np_ = _pad_rows(n)
    if np_ != n:
        x = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
    out = _fused_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                        float(eps), interpret)
    return out[:, :n, :]


def mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, *, eps: float):
    """Backend dispatch: fused Pallas program on accelerators, XLA
    composition on CPU."""
    if jax.default_backend() == "cpu":
        from uvc_tpu.ops import attention as _attn
        if _attn._FORCE_FUSED_INTERPRET:
            return fused_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                                eps=eps, interpret=True)
        return _composed_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                                eps)
    return fused_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps=eps)
