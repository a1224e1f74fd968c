"""Fused performer-stage kernel (ops/performer.py) vs the composed
apply_performer: forward + full VJP in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvc_tpu.models.t2t_vit import apply_performer, init_performer
from uvc_tpu.ops.performer import _choose_tiles, fused_performer


@pytest.fixture(scope="module")
def setup():
    dim, emb, b, n = 24, 16, 2, 48
    p = init_performer(jax.random.PRNGKey(0), dim, emb)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, dim)) * 0.5
    return p, x


def test_tiling():
    for b, n, dim in [(256, 3136, 147), (256, 3136, 192), (256, 784, 576),
                      (2, 48, 24)]:
        bg, tile = _choose_tiles(b, n, dim, 64)
        assert bg is not None and b % bg == 0 and n % tile == 0, (b, n)
    # un-tileable token counts fall back to the composed path
    assert _choose_tiles(4, 50, 64, 64) == (None, None)


@pytest.mark.parametrize("merged", [False, True])
def test_fused_performer_fwd(setup, merged):
    p, x = setup
    ref = apply_performer(p, x, dtype=jnp.float32)
    out = fused_performer(p, x, dtype=jnp.float32, interpret=True,
                          merged=merged)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("merged", [False, True])
def test_fused_performer_vjp(setup, merged):
    """All 13 trainable grads (x, 2xLN, kqv, proj, fc1, fc2) must match
    autodiff through the composed stage; prm_w is frozen in both."""
    p, x = setup

    def loss_ref(p, x):
        return jnp.sum(apply_performer(p, x, dtype=jnp.float32) ** 2)

    def loss_fused(p, x):
        return jnp.sum(fused_performer(p, x, dtype=jnp.float32,
                                       interpret=True,
                                       merged=merged) ** 2)

    (gr_p, gr_x) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gf_p, gf_x) = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=5e-3, atol=5e-3, err_msg="dx")
    flat_r = jax.tree_util.tree_leaves_with_path(gr_p)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf_p))
    for path, val in flat_r:
        name = jax.tree_util.keystr(path)
        if "prm_w" in name:
            continue   # frozen: composed uses stop_gradient too
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val),
            rtol=5e-3, atol=5e-3, err_msg=name)


@pytest.mark.parametrize("merged", [False, True])
def test_s2d_stage1_matches_unfold_path(merged):
    """The space-to-depth expanded layout + slot-scattered weights +
    masked LN1 must reproduce unfold -> performer exactly (fwd + grads)."""
    from uvc_tpu.models.t2t_vit import _unfold
    from uvc_tpu.ops.performer import s2d_stage1_inputs

    c = 3
    dim = c * 49
    emb = 16
    p = init_performer(jax.random.PRNGKey(2), dim, emb)
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, c)) * 0.5

    def ref(p, img):
        t = _unfold(img, 7, 4, 2)
        return apply_performer(p, t, dtype=jnp.float32)

    def fused(p, img):
        xs, idx = s2d_stage1_inputs(img)
        assert xs is not None and xs.shape == (2, 16, 64 * c)
        out = fused_performer(p, xs, dtype=jnp.float32, interpret=True,
                              feat_idx=idx, merged=merged)
        assert out is not None
        return out

    orf = ref(p, img)
    of = fused(p, img)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                               rtol=2e-3, atol=2e-3)

    gr_p, gr_x = jax.grad(lambda p, i: jnp.sum(ref(p, i) ** 2),
                          argnums=(0, 1))(p, img)
    gf_p, gf_x = jax.grad(lambda p, i: jnp.sum(fused(p, i) ** 2),
                          argnums=(0, 1))(p, img)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=5e-3, atol=5e-3, err_msg="dimg")
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf_p))
    for path, val in jax.tree_util.tree_leaves_with_path(gr_p):
        name = jax.tree_util.keystr(path)
        if "prm_w" in name:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val),
            rtol=5e-3, atol=5e-3, err_msg=name)


@pytest.mark.parametrize("merged", [False, True])
def test_klast_unfold_perm_matches_unfold_path(merged):
    """(kh,kw,c)-ordered unfold + row-permuted weights == nn.Unfold order
    + original weights (stage-2/3 fast path), fwd + grads."""
    from uvc_tpu.models.t2t_vit import _klast_perm, _unfold, _unfold_klast

    c, k = 8, 3
    dim, emb = c * k * k, 16
    p = init_performer(jax.random.PRNGKey(4), dim, emb)
    img = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, c)) * 0.5

    def ref(p, img):
        return apply_performer(p, _unfold(img, k, 2, 1), dtype=jnp.float32)

    def fused(p, img):
        out = fused_performer(p, _unfold_klast(img, k, 2, 1),
                              dtype=jnp.float32, interpret=True,
                              feat_idx=_klast_perm(k, c), merged=merged)
        assert out is not None
        return out

    np.testing.assert_allclose(np.asarray(fused(p, img)),
                               np.asarray(ref(p, img)),
                               rtol=2e-3, atol=2e-3)
    gr_p, gr_x = jax.grad(lambda p, i: jnp.sum(ref(p, i) ** 2),
                          argnums=(0, 1))(p, img)
    gf_p, gf_x = jax.grad(lambda p, i: jnp.sum(fused(p, i) ** 2),
                          argnums=(0, 1))(p, img)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=5e-3, atol=5e-3, err_msg="dimg")
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf_p))
    for path, val in jax.tree_util.tree_leaves_with_path(gr_p):
        name = jax.tree_util.keystr(path)
        if "prm_w" in name:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val),
            rtol=5e-3, atol=5e-3, err_msg=name)


def test_merged_multi_tile_vjp(monkeypatch):
    """Merged kernels with ntiles > 1 (n = 1568 -> two 784 tiles): the
    phase-1 scratch buffers and the in-place dx accumulation must
    reproduce the composed stage across tile boundaries."""
    from uvc_tpu.ops import performer as perf_mod

    dim, emb, b, n = 24, 16, 2, 1568
    p = init_performer(jax.random.PRNGKey(6), dim, emb)
    x = jax.random.normal(jax.random.PRNGKey(7), (b, n, dim)) * 0.5
    # at this tiny dim the whole n fits as one tile; pin the multi-tile
    # configuration (fwd bg=2, bwd bg=1, two 784 tiles) explicitly
    monkeypatch.setattr(perf_mod, "_choose_merged",
                        lambda *a: ((2, 784), (1, 784)))

    ref = apply_performer(p, x, dtype=jnp.float32)
    out = fused_performer(p, x, dtype=jnp.float32, interpret=True,
                          merged=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    gr_p, gr_x = jax.grad(
        lambda p, x: jnp.sum(apply_performer(p, x, dtype=jnp.float32) ** 2),
        argnums=(0, 1))(p, x)
    gf_p, gf_x = jax.grad(
        lambda p, x: jnp.sum(fused_performer(
            p, x, dtype=jnp.float32, interpret=True, merged=True) ** 2),
        argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=5e-3, atol=5e-3, err_msg="dx")
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf_p))
    for path, val in jax.tree_util.tree_leaves_with_path(gr_p):
        name = jax.tree_util.keystr(path)
        if "prm_w" in name:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val),
            rtol=5e-3, atol=5e-3, err_msg=name)
