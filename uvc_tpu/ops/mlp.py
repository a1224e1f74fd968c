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


def _mlp_ln_blend_fwd_kernel(x_ref, xin_ref, d_ref, g2_ref, b2_ref,
                             wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                             mask_ref, o_ref, *, group: int, eps: float):
    """Gated-block variant: o = d1*(x + mlp(LN(x))) + d0*xin.

    Absorbs the stage-1 block-gating blend (reference
    model_distilled.py:477-507 ``distrib[1]*block(x) + distrib[0]*x``)
    into the MLP sublayer program: the pre-blend block output never
    reaches HBM — the blend is two VPU FMAs on values already in VMEM.
    Replaces the separate XLA blend pass (read out + read x + write o =
    3 extra [B, N, D] round trips per block) AND the "block_out" remat
    save (models/vit.py) whose only consumer was the gating gradient."""
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
    d0 = d_ref[0]
    d1 = d_ref[1]
    xin32 = xin_ref[...].reshape(group * np_, dm).astype(jnp.float32)
    o_ref[...] = (d1 * (x32 + out) + d0 * xin32) \
        .reshape(group, np_, dm).astype(o_ref.dtype)


def _mlp_ln_blend_bwd_kernel(*refs, group: int, eps: float, full: bool):
    """Backward of the blended sublayer.  The gating gradients are exact
    identities on quantities already in VMEM — the pre-blend block output
    ``out`` is never needed (so it is neither saved by the remat policy
    nor rebuilt by a replayed forward):

      dd1 = sum(do*out) = sum(do*x) + sum(dam0*am) + colsum(do)@bfc2
            where dam0 = do @ wfc2^T (the un-scaled version of the dam
            the sublayer backward computes anyway),
      dd0 = sum(do*xin),   dxin = d0*do,   and the sublayer sees d1*do.

    ``full=False`` is the hidden-group-split variant for parts > 0: only
    the per-part sum(dam0*am) term of dd1, no residual/xin/bias terms
    (all linear decompositions, same argument as add_residual)."""
    if full:
        (x_ref, xin_ref, d_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref,
         wfc2_ref, bfc2_ref, mask_ref, do_ref, dx_ref, dxin_ref, dd0_ref,
         dd1_ref, dg2_ref, db2_ref, dwfc1_ref, dbfc1_ref, dwfc2_ref,
         dbfc2_ref, dmask_ref) = refs
    else:
        (x_ref, d_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref,
         mask_ref, do_ref, dx_ref, dd1_ref, dg2_ref, db2_ref, dwfc1_ref,
         dbfc1_ref, dwfc2_ref, dmask_ref) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        accs = [dd1_ref, dg2_ref, db2_ref, dwfc1_ref, dbfc1_ref,
                dwfc2_ref, dmask_ref]
        if full:
            accs += [dd0_ref, dbfc2_ref]
        for ref in accs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    gamma = g2_ref[...].astype(jnp.float32)
    beta = b2_ref[...].astype(jnp.float32)
    maskv = mask_ref[...].astype(jnp.float32)
    d1 = d_ref[1]
    for g in range(group):
        x32 = x_ref[g].astype(jnp.float32)
        m32, xhat, inv = _ln_rows(x32, gamma, beta, eps)
        m_in = m32.astype(jnp.bfloat16)
        h = (jnp.dot(m_in, wfc1_ref[...],
                     preferred_element_type=jnp.float32)
             + bfc1_ref[...].astype(jnp.float32))
        a, dgelu = _gelu_and_grad(h)
        am32 = a * maskv
        am = am32.astype(jnp.bfloat16)
        do = do_ref[g].astype(jnp.bfloat16)
        do32 = do_ref[g].astype(jnp.float32)
        # un-scaled dam: reused for BOTH the sublayer chain (scaled by d1)
        # and the gating gradient's sum(dam0*am) term
        dam0 = jax.lax.dot_general(
            do, wfc2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [N, F]
        dam = dam0 * d1
        dd1 = jnp.sum(dam0 * am32)
        dmask_ref[...] += jnp.sum(dam * a, axis=0, keepdims=True)
        dh = dam * maskv * dgelu
        dh_b = dh.astype(jnp.bfloat16)
        dwfc2_ref[...] += d1 * jax.lax.dot_general(
            am, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        colsum_do = jnp.sum(do32, axis=0, keepdims=True)     # [1, D]
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
        if full:
            dbfc2_ref[...] += d1 * colsum_do
            dd1 = dd1 + jnp.sum(do32 * x32) \
                + jnp.sum(colsum_do * bfc2_ref[...].astype(jnp.float32))
            xin32 = xin_ref[g].astype(jnp.float32)
            dd0_ref[...] += jnp.full((1, 128), jnp.sum(do32 * xin32),
                                     jnp.float32)
            dxin_ref[g] = (d_ref[0] * do32).astype(dxin_ref.dtype)
            dx_ref[g] = (dz + d1 * do32).astype(dx_ref.dtype)
        else:
            dx_ref[g] = dz.astype(dx_ref.dtype)
        dd1_ref[...] += jnp.full((1, 128), dd1, jnp.float32)
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


def _mlp_blend_fwd_group(b: int, dm: int, f: int, np_: int) -> int:
    forced = _env_group("UVC_MLPB_FWD_G")
    if forced:
        return forced
    weights = 2 * dm * f * 2
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = 3 * g * np_ * dm * 2 * 2          # x + xin + o, dbl-buf
        scratch = g * np_ * (dm * 4 * 2 + f * 4 * 2)
        if weights + blocks + scratch < 12 * 1024 * 1024:
            return g
    return 1


def _mlp_blend_bwd_group(b: int, dm: int, f: int, np_: int,
                         full: bool) -> Optional[int]:
    forced = _env_group("UVC_MLPB_BWD_G")
    if forced:
        return forced
    weights = 2 * dm * f * 2
    accums = 2 * dm * f * 4 + (2 * dm + 2 * f) * 4
    streams = 5 if full else 3                     # x,(xin),do,dx,(dxin)
    for g in (8, 4, 2, 1):
        if b % g:
            continue
        blocks = streams * g * np_ * dm * 2 * 2
        scratch = (np_ * dm * 4 * (4 if full else 3)
                   + np_ * f * 4 * 4 + np_ * f * 2 * 2)
        if weights + accums + scratch + blocks < 13 * 1024 * 1024:
            return g
    return None


def _call_mlp_blend_fwd(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                        eps, interpret=False):
    b, np_, dm = x.shape
    f = wfc1.shape[1]
    g = _mlp_blend_fwd_group(b, dm, f, np_)
    mspace = pl.ANY if interpret else pltpu.VMEM
    sspace = pl.ANY if interpret else pltpu.SMEM
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def wspec(shape, space=mspace):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=space)

    return pl.pallas_call(
        functools.partial(_mlp_ln_blend_fwd_kernel, group=g, eps=eps),
        grid=(b // g,),
        in_specs=[xspec, xspec, wspec((2,), sspace), wspec((dm,)),
                  wspec((dm,)), wspec((dm, f)), wspec((f,)),
                  wspec((f, dm)), wspec((dm,)), wspec((f,))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, np_, dm), x.dtype),
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask)


def _call_mlp_blend_bwd(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                        do, eps, g, interpret=False, full=True):
    b, np_, dm = x.shape
    f = wfc1.shape[1]
    mspace = pl.ANY if interpret else pltpu.VMEM
    sspace = pl.ANY if interpret else pltpu.SMEM
    xspec = pl.BlockSpec((g, np_, dm), lambda i: (i, 0, 0),
                         memory_space=mspace)

    def cspec(shape, space=mspace):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=space)

    # the blend backward's true scoped-VMEM footprint runs ~35% over the
    # group-picker's byte model at the budget boundary (measured on-chip:
    # 16.17M actual vs ~12M modeled at tiny B=512 g=8 — the model doesn't
    # count dam0/am32/do32 temporaries or double-buffered accumulator
    # outputs).  The default 16M scoped limit rejected exactly that
    # kernel inside the full train step (BENCH_r03 "fused compile
    # failed"); raise it to 32M — total VMEM is 128M on v5e and this
    # kernel runs a sequential grid, so the headroom is real.
    try:
        compiler_params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024)}
    except (TypeError, AttributeError):    # API drift: run with defaults
        compiler_params = {}
    f32 = jnp.float32
    sd = jax.ShapeDtypeStruct
    wgrads_specs = (cspec((1, dm)), cspec((1, dm)), cspec((dm, f)),
                    cspec((1, f)), cspec((f, dm)))
    wgrads_shapes = (sd((1, dm), f32), sd((1, dm), f32), sd((dm, f), f32),
                     sd((1, f), f32), sd((f, dm), f32))
    if full:
        in_specs = [xspec, xspec, cspec((2,), sspace), cspec((dm,)),
                    cspec((dm,)), cspec((dm, f)), cspec((f,)),
                    cspec((f, dm)), cspec((dm,)), cspec((f,)), xspec]
        ins = (x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, do)
        out_specs = ((xspec, xspec, cspec((1, 128)), cspec((1, 128)))
                     + wgrads_specs + (cspec((1, dm)), cspec((1, f))))
        out_shape = ((sd((b, np_, dm), x.dtype), sd((b, np_, dm), x.dtype),
                      sd((1, 128), f32), sd((1, 128), f32))
                     + wgrads_shapes + (sd((1, dm), f32), sd((1, f), f32)))
    else:
        in_specs = [xspec, cspec((2,), sspace), cspec((dm,)), cspec((dm,)),
                    cspec((dm, f)), cspec((f,)), cspec((f, dm)),
                    cspec((f,)), xspec]
        ins = (x, d, g2, b2, wfc1, bfc1, wfc2, mask, do)
        out_specs = ((xspec, cspec((1, 128)))
                     + wgrads_specs + (cspec((1, f)),))
        out_shape = ((sd((b, np_, dm), x.dtype), sd((1, 128), f32))
                     + wgrads_shapes + (sd((1, f), f32),))
    # sequential grid, constant-index_map accumulators (see _call_mlp_bwd)
    return pl.pallas_call(
        functools.partial(_mlp_ln_blend_bwd_kernel, group=g, eps=eps,
                          full=full),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **({} if interpret else compiler_params),
    )(*ins)


def _composed_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2,
                           mask, eps):
    """XLA twin of models/vit.py's separate blend:
    d1*(x + mlp(LN2(x))) + d0*xin."""
    out = _composed_mlp_ln(x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, eps)
    dt = d.astype(x.dtype)
    return dt[1] * out + dt[0] * xin


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _fused_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                        eps, interpret):
    return _call_mlp_blend_fwd(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2,
                               mask, eps, interpret)


def _fused_mlp_ln_blend_fwd(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2,
                            mask, eps, interpret):
    out = _fused_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2,
                              mask, eps, interpret)
    # residuals are all either remat-policy-saved upstream ("attn_out" =
    # x) or checkpoint inputs (xin = the scan carry) — the replayed
    # forward kernel feeds nothing and is DCE'd (the invariant
    # tests/test_attention_kernel.py guards)
    return out, (x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask)


def _fused_mlp_ln_blend_bwd(eps, interpret, res, dout):
    x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask = res
    b, np_, dm = x.shape
    f = wfc1.shape[1]
    g = _mlp_blend_bwd_group(b, dm, f, np_, full=True)
    if g is not None:
        (dx, dxin, dd0, dd1, dg2, db2, dwfc1, dbfc1, dwfc2, dbfc2,
         dmask) = _call_mlp_blend_bwd(
            x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, dout, eps, g,
            interpret, full=True)
        dd = jnp.stack([dd0[0, 0], dd1[0, 0]]).astype(d.dtype)
        return (dx, dxin, dd, dg2[0].astype(g2.dtype),
                db2[0].astype(b2.dtype), dwfc1.astype(wfc1.dtype),
                dbfc1[0].astype(bfc1.dtype), dwfc2.astype(wfc2.dtype),
                dbfc2[0].astype(bfc2.dtype), dmask[0].astype(mask.dtype))
    # hidden-group split: part 0 carries the blend/residual/bias terms,
    # parts > 0 contribute only their fc1-column slice of the sublayer
    # grads and their sum(dam0*am) slice of dd1 (all linear — see
    # _fused_mlp_ln_bwd's decomposition argument)
    # the full-variant budget dominates the lite one, so one ng chosen on
    # the full budget works for every part
    for ng in (2, 4, 8):
        if f % ng == 0 and (f // ng) % 128 == 0:
            if _mlp_blend_bwd_group(b, dm, f // ng, np_,
                                    full=True) is not None:
                break
    else:
        ng = None
    if ng is None:
        _, vjp = jax.vjp(
            lambda *a: _composed_mlp_ln_blend(*a, eps), x, xin, d, g2, b2,
            wfc1, bfc1, wfc2, bfc2, mask)
        return vjp(dout)
    fg = f // ng
    g_full = _mlp_blend_bwd_group(b, dm, fg, np_, full=True)
    g_lite = _mlp_blend_bwd_group(b, dm, fg, np_, full=False)
    parts = []
    for i in range(ng):
        lo, hi = i * fg, (i + 1) * fg
        if i == 0:
            parts.append(_call_mlp_blend_bwd(
                x, xin, d, g2, b2, wfc1[:, lo:hi], bfc1[lo:hi],
                wfc2[lo:hi, :], bfc2, mask[lo:hi], dout, eps, g_full,
                interpret, full=True))
        else:
            parts.append(_call_mlp_blend_bwd(
                x, None, d, g2, b2, wfc1[:, lo:hi], bfc1[lo:hi],
                wfc2[lo:hi, :], None, mask[lo:hi], dout, eps, g_lite,
                interpret, full=False))
    (dx, dxin, dd0, dd1, dg2, db2, dwfc1_0, dbfc1_0, dwfc2_0, dbfc2,
     dmask_0) = parts[0]
    dd1v = dd1[0, 0]
    dwfc1 = [dwfc1_0]
    dbfc1 = [dbfc1_0[0]]
    dwfc2 = [dwfc2_0]
    dmask = [dmask_0[0]]
    for p in parts[1:]:
        # lite tuple: (dx, dd1, dg2, db2, dwfc1, dbfc1, dwfc2, dmask)
        dx = dx + p[0]
        dd1v = dd1v + p[1][0, 0]
        dg2 = dg2 + p[2]
        db2 = db2 + p[3]
        dwfc1.append(p[4])
        dbfc1.append(p[5][0])
        dwfc2.append(p[6])
        dmask.append(p[7][0])
    dd = jnp.stack([dd0[0, 0], dd1v]).astype(d.dtype)
    return (dx.astype(x.dtype), dxin, dd, dg2[0].astype(g2.dtype),
            db2[0].astype(b2.dtype),
            jnp.concatenate(dwfc1, axis=1).astype(wfc1.dtype),
            jnp.concatenate(dbfc1).astype(bfc1.dtype),
            jnp.concatenate(dwfc2, axis=0).astype(wfc2.dtype),
            dbfc2[0].astype(bfc2.dtype),
            jnp.concatenate(dmask).astype(mask.dtype))


_fused_mlp_ln_blend.defvjp(_fused_mlp_ln_blend_fwd, _fused_mlp_ln_blend_bwd)


def fused_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, *,
                       eps: float, interpret: bool = False):
    """d1*(x + mlp_sublayer(LN2(x))) + d0*xin as one program each way —
    the stage-1 gated block's MLP half plus the block-gating blend.
    ``d`` is the [2] f32 gating distribution (d0=skip, d1=keep)."""
    b, n, _ = x.shape
    np_ = _pad_rows(n)
    if np_ != n:
        pad = ((0, 0), (0, np_ - n), (0, 0))
        x = jnp.pad(x, pad)
        xin = jnp.pad(xin, pad)
    out = _fused_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2,
                              mask, float(eps), interpret)
    return out[:, :n, :]


def mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, *,
                 eps: float):
    """Backend dispatch for the blended sublayer."""
    if jax.default_backend() == "cpu":
        from uvc_tpu.ops import attention as _attn
        if _attn._FORCE_FUSED_INTERPRET:
            return fused_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2,
                                      bfc2, mask, eps=eps, interpret=True)
        return _composed_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2,
                                      bfc2, mask, eps)
    return fused_mlp_ln_blend(x, xin, d, g2, b2, wfc1, bfc1, wfc2, bfc2,
                              mask, eps=eps)


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
