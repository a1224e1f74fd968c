"""Fused attention kernel: interpret-mode vs the jnp oracle, fwd + vjp,
including the sequence-padding mask path (N not a lane multiple)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvc_tpu.ops.attention import (fused_attention, reference_attention,
                                   _pad_len)


@pytest.mark.parametrize("n", [8, 12])          # 12: exercises padding mask
@pytest.mark.parametrize("b,h,dh", [(2, 2, 8)])
def test_fused_matches_reference_fwd(b, h, dh, n):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, dh), jnp.float32)
               for kk in ks)
    scale = dh ** -0.5
    ref = reference_attention(q, k, v, scale)
    out = fused_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_vjp_matches_reference():
    b, h, n, dh = 2, 2, 12, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, dh), jnp.float32)
               for kk in ks)
    scale = dh ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, scale) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_attention(q, k, v, scale, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2)


def test_padding_mask_excludes_padded_keys():
    """Padded key rows must receive zero attention: output for n=12 equals
    output computed on the unpadded problem."""
    b, h, n, dh = 1, 1, 12, 8
    assert _pad_len(n) == 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, dh)) for kk in ks)
    out = fused_attention(q, k, v, 0.5, interpret=True)
    ref = reference_attention(q, k, v, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert out.shape == (b, h, n, dh)


# ---------------------------------------------------------------------------
# fused layer kernel (qkv + attention + mask + proj in one program)
# ---------------------------------------------------------------------------


def _composed_layer(x, wqkv, bqkv, wproj, bproj, mask, heads, scale):
    b, n, d = x.shape
    dh = d // heads
    qkv = (x @ wqkv + bqkv).reshape(b, n, 3, heads, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ctx = reference_attention(q, k, v, scale)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d) * mask
    return ctx @ wproj + bproj


def _layer_inputs(b=2, n=12, d=16):
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(ks[0], (b, n, d))
    wqkv = jax.random.normal(ks[1], (d, 3 * d)) * 0.1
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.1
    wproj = jax.random.normal(ks[3], (d, d)) * 0.1
    bproj = jax.random.normal(ks[4], (d,)) * 0.1
    mask = (jax.random.uniform(ks[5], (d,)) > 0.3).astype(jnp.float32)
    return x, wqkv, bqkv, wproj, bproj, mask


def test_fused_layer_fwd_matches_composition():
    from uvc_tpu.ops.attention import fused_layer_attention
    args = _layer_inputs()
    heads, scale = 2, (args[0].shape[-1] // 2) ** -0.5
    ref = _composed_layer(*args, heads, scale)
    out = fused_layer_attention(*args, num_heads=heads, scale=scale,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_layer_vjp_matches_composition():
    """The combined backward kernel (_bwd_ctx_kernel: softmax recomputed
    once, ctx emitted alongside dq/dk/dv) must produce the same grads as
    autodiff through the plain composition — including the structural-mask
    grad, which feeds the UVC score path."""
    from uvc_tpu.ops.attention import fused_layer_attention
    args = _layer_inputs()
    heads, scale = 2, (args[0].shape[-1] // 2) ** -0.5

    def loss_ref(*a):
        return jnp.sum(_composed_layer(*a, heads, scale) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_layer_attention(
            *a, num_heads=heads, scale=scale, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for name, a, b_ in zip(["dx", "dwqkv", "dbqkv", "dwproj", "dbproj",
                            "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_fused_layer_vjp_rectangular():
    """Rectangular widths (attention width != model width — the compact
    stage-2 training layers, train/compact_ft.py) must route the backward
    to the composed fallback and match autodiff through the rectangular
    composition."""
    from uvc_tpu.ops.attention import fused_layer_attention

    b, n, d, da, heads = 2, 12, 16, 8, 2
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    x = jax.random.normal(ks[0], (b, n, d))
    wqkv = jax.random.normal(ks[1], (d, 3 * da)) * 0.1
    bqkv = jax.random.normal(ks[2], (3 * da,)) * 0.1
    wproj = jax.random.normal(ks[3], (da, d)) * 0.1
    bproj = jax.random.normal(ks[4], (d,)) * 0.1
    mask = (jax.random.uniform(ks[5], (da,)) > 0.3).astype(jnp.float32)
    args = (x, wqkv, bqkv, wproj, bproj, mask)
    scale = (da // heads) ** -0.5

    def composed_rect(x, wqkv, bqkv, wproj, bproj, mask):
        dh = da // heads
        qkv = (x @ wqkv + bqkv).reshape(b, n, 3, heads, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        ctx = reference_attention(q, k, v, scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, da) * mask
        return ctx @ wproj + bproj

    out = fused_layer_attention(*args, num_heads=heads, scale=scale,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(composed_rect(*args)),
                               rtol=2e-2, atol=2e-2)

    def loss_ref(*a):
        return jnp.sum(composed_rect(*a) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_layer_attention(
            *a, num_heads=heads, scale=scale, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for name, a, b_ in zip(["dx", "dwqkv", "dbqkv", "dwproj", "dbproj",
                            "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_fused_layer_ln_vjp_rectangular():
    """The LN-fused sublayer's rectangular backward (LN peel + delegate)
    must match autodiff through the rectangular composition."""
    from uvc_tpu.ops.attention import fused_layer_attention_ln

    b, n, d, da, heads = 2, 12, 16, 8, 2
    ks = jax.random.split(jax.random.PRNGKey(8), 8)
    x = jax.random.normal(ks[0], (b, n, d))
    g1 = 1.0 + 0.1 * jax.random.normal(ks[6], (d,))
    b1 = 0.1 * jax.random.normal(ks[7], (d,))
    wqkv = jax.random.normal(ks[1], (d, 3 * da)) * 0.1
    bqkv = jax.random.normal(ks[2], (3 * da,)) * 0.1
    wproj = jax.random.normal(ks[3], (da, d)) * 0.1
    bproj = jax.random.normal(ks[4], (d,)) * 0.1
    mask = (jax.random.uniform(ks[5], (da,)) > 0.3).astype(jnp.float32)
    args = (x, g1, b1, wqkv, bqkv, wproj, bproj, mask)
    scale = (da // heads) ** -0.5
    eps = 1e-6

    def composed_rect(x, g1, b1, wqkv, bqkv, wproj, bproj, mask):
        dh = da // heads
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        a_in = ((x32 - mu) * jax.lax.rsqrt(var + eps) * g1 + b1
                ).astype(x.dtype)
        qkv = (a_in @ wqkv + bqkv).reshape(b, n, 3, heads, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        ctx = reference_attention(q, k, v, scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, da) * mask
        return x + ctx @ wproj + bproj

    def loss_ref(*a):
        return jnp.sum(composed_rect(*a) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_layer_attention_ln(
            *a, num_heads=heads, scale=scale, eps=eps,
            interpret=True) ** 2)

    np.testing.assert_allclose(
        np.asarray(fused_layer_attention_ln(
            *args, num_heads=heads, scale=scale, eps=eps, interpret=True)),
        np.asarray(composed_rect(*args)), rtol=2e-2, atol=2e-2)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    for name, a, b_ in zip(["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwproj",
                            "dbproj", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_remat_policy_grads_match_norecompute():
    """transformer_encode's save_only_these_names("attn_out") policy must
    not change gradients vs remat=False (pure memory/scheduling choice)."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit

    cfg = get_config("testing")
    key = jax.random.PRNGKey(0)
    params = vit.init_params(key, cfg)
    x = jax.random.normal(key, (2, cfg.seq_len, cfg.embed_dim))

    def loss(p, remat):
        return jnp.sum(vit.transformer_encode(p, x, cfg, remat=remat) ** 2)

    g1 = jax.grad(lambda p: loss(p, True))(params)
    g0 = jax.grad(lambda p: loss(p, False))(params)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_fused_layer_vjp_head_group_split():
    """Wide widths route through the head-group-split backward (the same
    kernel per group, dwqkv columns / dwproj rows reassembled, partial dx
    summed).  d=768/heads=6 with N->128 padding triggers ng=2 on the VMEM
    estimate; grads must still match the composition."""
    from uvc_tpu.ops.attention import (_head_group_split, _pad_rows,
                                       fused_layer_attention)
    b, n, d, heads = 1, 12, 768, 6
    ng, _ = _head_group_split(b, d, heads, _pad_rows(n))
    assert ng == 2, f"expected the split path, got ng={ng}"
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    x = jax.random.normal(ks[0], (b, n, d)) * 0.5
    wqkv = jax.random.normal(ks[1], (d, 3 * d)) * 0.03
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.03
    wproj = jax.random.normal(ks[3], (d, d)) * 0.03
    bproj = jax.random.normal(ks[4], (d,)) * 0.03
    mask = (jax.random.uniform(ks[5], (d,)) > 0.3).astype(jnp.float32)
    scale = (d // heads) ** -0.5
    args = (x, wqkv, bqkv, wproj, bproj, mask)

    def loss_ref(*a):
        return jnp.sum(_composed_layer(*a, heads, scale) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_layer_attention(
            *a, num_heads=heads, scale=scale, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    for name, a, b_ in zip(["dx", "dwqkv", "dbqkv", "dwproj", "dbproj",
                            "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


# ---------------------------------------------------------------------------
# LN-fused sublayer (LN1 + qkv + attention + mask + proj + residual)
# ---------------------------------------------------------------------------


def _composed_layer_ln(x, g1, b1, wqkv, bqkv, wproj, bproj, mask, heads,
                       scale, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    a_in = ((x32 - mean) * jax.lax.rsqrt(var + eps) * g1 + b1).astype(x.dtype)
    return x + _composed_layer(a_in, wqkv, bqkv, wproj, bproj, mask, heads,
                               scale)


def _layer_ln_inputs(b=2, n=12, d=16):
    x, wqkv, bqkv, wproj, bproj, mask = _layer_inputs(b, n, d)
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    g1 = 1.0 + 0.1 * jax.random.normal(ks[0], (d,))
    b1 = 0.1 * jax.random.normal(ks[1], (d,))
    return x, g1, b1, wqkv, bqkv, wproj, bproj, mask


def test_fused_layer_ln_fwd_matches_composition():
    from uvc_tpu.ops.attention import fused_layer_attention_ln
    args = _layer_ln_inputs()
    heads, scale = 2, (args[0].shape[-1] // 2) ** -0.5
    ref = _composed_layer_ln(*args, heads, scale)
    out = fused_layer_attention_ln(*args, num_heads=heads, scale=scale,
                                   eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_layer_ln_vjp_matches_composition():
    """The LN-fused backward kernel must reproduce autodiff through the
    composition for ALL eight inputs — including the LN scale/bias grads
    (new accumulators) and the residual path in dx."""
    from uvc_tpu.ops.attention import fused_layer_attention_ln
    args = _layer_ln_inputs()
    heads, scale = 2, (args[0].shape[-1] // 2) ** -0.5

    def loss_ref(*a):
        return jnp.sum(_composed_layer_ln(*a, heads, scale) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_layer_attention_ln(
            *a, num_heads=heads, scale=scale, eps=1e-6,
            interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    for name, a, b_ in zip(["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwproj",
                            "dbproj", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_fused_layer_ln_wide_fallback_vjp():
    """Widths whose f32 accumulators overflow the VMEM budget must route
    through the LN-peel + delegated backward and still match autodiff."""
    from uvc_tpu.ops.attention import (_layer_ln_bwd_group, _pad_rows,
                                       fused_layer_attention_ln)
    b, n, d, heads = 1, 12, 768, 6
    assert _layer_ln_bwd_group(b, d, _pad_rows(n)) is None, \
        "expected the fallback path at d=768"
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    x = jax.random.normal(ks[0], (b, n, d)) * 0.5
    g1 = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    b1 = 0.1 * jax.random.normal(ks[2], (d,))
    wqkv = jax.random.normal(ks[3], (d, 3 * d)) * 0.03
    bqkv = jax.random.normal(ks[4], (3 * d,)) * 0.03
    wproj = jax.random.normal(ks[5], (d, d)) * 0.03
    bproj = jax.random.normal(ks[6], (d,)) * 0.03
    mask = (jax.random.uniform(ks[7], (d,)) > 0.3).astype(jnp.float32)
    args = (x, g1, b1, wqkv, bqkv, wproj, bproj, mask)
    heads_scale = (d // heads) ** -0.5

    def loss_ref(*a):
        return jnp.sum(_composed_layer_ln(*a, heads, heads_scale) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_layer_attention_ln(
            *a, num_heads=heads, scale=heads_scale, eps=1e-6,
            interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    for name, a, b_ in zip(["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwproj",
                            "dbproj", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


# ---------------------------------------------------------------------------
# LN-fused MLP sublayer (LN2 + fc1 + GELU + mask + fc2 + residual)
# ---------------------------------------------------------------------------


def _mlp_inputs(b=2, n=12, d=16, f=32, w_scale=0.1):
    # w_scale keeps activations O(1): the kernel runs its matmul inputs
    # in bf16 (training numerics) while the f32 oracle does not, so
    # badly-scaled wide shapes amplify that rounding past the tolerance
    ks = jax.random.split(jax.random.PRNGKey(21), 8)
    x = jax.random.normal(ks[0], (b, n, d))
    g2 = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    b2 = 0.1 * jax.random.normal(ks[2], (d,))
    wfc1 = jax.random.normal(ks[3], (d, f)) * w_scale
    bfc1 = jax.random.normal(ks[4], (f,)) * w_scale
    wfc2 = jax.random.normal(ks[5], (f, d)) * w_scale
    bfc2 = jax.random.normal(ks[6], (d,)) * w_scale
    mask = (jax.random.uniform(ks[7], (f,)) > 0.3).astype(jnp.float32)
    return x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask


def test_fused_mlp_ln_fwd_matches_composition():
    from uvc_tpu.ops.mlp import _composed_mlp_ln, fused_mlp_ln
    args = _mlp_inputs()
    ref = _composed_mlp_ln(*args, 1e-6)
    out = fused_mlp_ln(*args, eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_mlp_ln_vjp_matches_composition():
    """All eight grads of the LN-fused MLP backward kernel vs autodiff
    through the XLA composition (incl. the structural-mask grad that
    feeds the UVC score path and the residual term in dx)."""
    from uvc_tpu.ops.mlp import _composed_mlp_ln, fused_mlp_ln
    args = _mlp_inputs()

    def loss_ref(*a):
        return jnp.sum(_composed_mlp_ln(*a, 1e-6) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_ln(*a, eps=1e-6, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    for name, a, b_ in zip(["dx", "dg2", "db2", "dwfc1", "dbfc1", "dwfc2",
                            "dbfc2", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_fused_mlp_ln_wide_fallback_vjp():
    """Widths whose f32 accumulators overflow VMEM route through the
    hidden-group-split backward (per-group fc1 columns / fc2 rows, LN vjp
    summed, residual added once) — grads must still match autodiff of
    the composition."""
    from uvc_tpu.ops.mlp import (_composed_mlp_ln, _mlp_bwd_group,
                                 _pad_rows, fused_mlp_ln)
    b, n, d, f = 1, 12, 768, 3072
    assert _mlp_bwd_group(b, d, f, _pad_rows(n)) is None, \
        "expected the fallback path at d=768/f=3072"
    args = _mlp_inputs(b, n, d, f, w_scale=0.02)

    def loss_ref(*a):
        return jnp.sum(_composed_mlp_ln(*a, 1e-6) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_ln(*a, eps=1e-6, interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    # atol slightly above the small-shape tests: bf16 kernel matmuls vs
    # the f32 oracle accumulate ~sqrt(f)=55x more rounding at f=3072
    for name, a, b_ in zip(["dx", "dg2", "db2", "dwfc1", "dbfc1", "dwfc2",
                            "dbfc2", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=1e-1, err_msg=name)


# ---------------------------------------------------------------------------
# Blend-fused MLP sublayer (sublayer + block-gating blend in one program)
# ---------------------------------------------------------------------------


def _blend_inputs(b=2, n=12, d=16, f=32, w_scale=0.1):
    x, g2, b2, wfc1, bfc1, wfc2, bfc2, mask = _mlp_inputs(
        b, n, d, f, w_scale)
    ks = jax.random.split(jax.random.PRNGKey(77), 2)
    xin = jax.random.normal(ks[0], (b, n, d))
    dd = jax.nn.softmax(jax.random.normal(ks[1], (2,))).astype(jnp.float32)
    return x, xin, dd, g2, b2, wfc1, bfc1, wfc2, bfc2, mask


def test_fused_mlp_ln_blend_fwd_matches_composition():
    from uvc_tpu.ops.mlp import _composed_mlp_ln_blend, fused_mlp_ln_blend
    args = _blend_inputs()
    ref = _composed_mlp_ln_blend(*args, 1e-6)
    out = fused_mlp_ln_blend(*args, eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_mlp_ln_blend_vjp_matches_composition():
    """All ten grads of the blended backward — incl. the gating grads
    dd0/dd1 rebuilt in-kernel (sum(do*x) + sum(dam0*am) + colsum(do)@bfc2
    instead of sum(do*out)) and the dxin = d0*do stream."""
    from uvc_tpu.ops.mlp import _composed_mlp_ln_blend, fused_mlp_ln_blend
    args = _blend_inputs()

    def loss_ref(*a):
        return jnp.sum(_composed_mlp_ln_blend(*a, 1e-6) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_ln_blend(*a, eps=1e-6,
                                          interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    for name, a, b_ in zip(["dx", "dxin", "dd", "dg2", "db2", "dwfc1",
                            "dbfc1", "dwfc2", "dbfc2", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_fused_mlp_ln_blend_split_vjp():
    """DeiT-Small/Base widths route the blended backward through the
    hidden-group split (part 0 full: residual + xin/bias/dd0 terms; parts
    > 0 lite: slice grads + their sum(dam0*am) share of dd1)."""
    from uvc_tpu.ops.mlp import (_composed_mlp_ln_blend,
                                 _mlp_blend_bwd_group, _pad_rows,
                                 fused_mlp_ln_blend)
    b, n, d, f = 1, 12, 768, 3072
    assert _mlp_blend_bwd_group(b, d, f, _pad_rows(n), full=True) is None, \
        "expected the split path at d=768/f=3072"
    args = _blend_inputs(b, n, d, f, w_scale=0.02)

    def loss_ref(*a):
        return jnp.sum(_composed_mlp_ln_blend(*a, 1e-6) ** 2)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_ln_blend(*a, eps=1e-6,
                                          interpret=True) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    for name, a, b_ in zip(["dx", "dxin", "dd", "dg2", "db2", "dwfc1",
                            "dbfc1", "dwfc2", "dbfc2", "dmask"], gr, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-2, atol=1e-1, err_msg=name)


def test_remat_replay_dces_forward_kernels():
    """The perf-critical remat invariant: under the block scan's
    save_only_these_names("attn_out") policy with BOTH sublayers as
    custom-VJP Pallas ops, a value-and-grad trace must contain exactly
    4 kernel calls per block — attn fwd, mlp fwd, mlp bwd, attn bwd —
    i.e. the backward replay's forward kernels are dead code and DCE'd
    (previously only checkable by counting tpu_custom_calls in on-chip
    HLO, per CLAUDE.md)."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit
    from uvc_tpu.ops import attention as attn_mod

    cfg = get_config("testing").replace(depth=2)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.seq_len, cfg.embed_dim))

    old = attn_mod._FORCE_FUSED_INTERPRET
    attn_mod._FORCE_FUSED_INTERPRET = True
    try:
        def loss(p):
            return jnp.sum(vit.transformer_encode(p, x, cfg) ** 2)

        jaxpr = jax.make_jaxpr(jax.value_and_grad(loss))(params)
    finally:
        attn_mod._FORCE_FUSED_INTERPRET = old
    n_calls = str(jaxpr).count("pallas_call")
    # scan-stacked: the 2-block loop traces each kernel ONCE inside the
    # scan body; fwd scan has 2 kernels, bwd scan has 2 bwd kernels, and
    # the replayed fwd kernels must be DCE'd (6 would mean they are not)
    assert n_calls == 4, f"expected 4 pallas calls in the trace, got {n_calls}"


def test_remat_replay_dces_forward_kernels_gated():
    """Same invariant on the stage-1 path: with a DIFFERENTIABLE block
    gating distribution, the blend's gating gradient sum(do*out) needs the
    block output — the save policy keeps it by name ("block_out"), else
    the replay re-runs the whole fused MLP forward per block (the 5th
    pallas call this test guards against)."""
    from uvc_tpu.configs import get_config
    from uvc_tpu.models import vit
    from uvc_tpu.ops import attention as attn_mod
    from uvc_tpu.ops.gumbel import block_gating_distrib

    cfg = get_config("testing").replace(depth=2)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.seq_len, cfg.embed_dim))
    key = jax.random.PRNGKey(3)

    old = attn_mod._FORCE_FUSED_INTERPRET
    attn_mod._FORCE_FUSED_INTERPRET = True
    try:
        def loss(p):
            gd = block_gating_distrib(key, p["block_gating"],
                                      use_gumbel=True, gumbel_hard=False,
                                      eps=0.1, warmup=False)
            return jnp.sum(vit.transformer_encode(
                p, x, cfg, gating_distrib=gd) ** 2)

        jaxpr = jax.make_jaxpr(jax.value_and_grad(loss))(params)
    finally:
        attn_mod._FORCE_FUSED_INTERPRET = old
    n_calls = str(jaxpr).count("pallas_call")
    assert n_calls == 4, f"expected 4 pallas calls in the trace, got {n_calls}"
