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
