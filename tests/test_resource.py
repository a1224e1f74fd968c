"""Golden-value tests for the analytic FLOPs model.

The reference probes MACs at runtime with a ones-batch; its published logs
pin the dense numbers (e.g. DeiT-Tiny "Initial FLOP size: 2506.98M",
/root/reference/log/deit-tiny-log.log).  Our closed-form table must
reproduce them exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvc_tpu.configs import get_config
from uvc_tpu.compress.resource import build_macs_table, flops_fraction


def test_deit_tiny_dense_probe_golden():
    table = build_macs_table(get_config("deit_tiny_patch16_224"))
    # log/deit-tiny-log.log: "** Initial FLOP size: 2506.98M"
    assert abs(table.dense_flops / 1e6 - 2506.98) < 0.01


def test_deit_tiny_block_macs_hand_computed():
    cfg = get_config("deit_tiny_patch16_224")
    table = build_macs_table(cfg)
    d, n, dff = 192, 197, 768
    assert table.embed == 196 * d * 256 * 3
    np.testing.assert_allclose(
        table.block[0],
        [3 * d * n * d, n * n * d, n * n * d, n * d * d,
         dff * n * d, d * n * dff])


def test_dense_fraction_is_one():
    cfg = get_config("deit_tiny_patch16_224")
    table = build_macs_table(cfg)
    s = jnp.zeros((cfg.depth, 2))
    r = jnp.zeros((cfg.depth, cfg.num_heads))
    scores2 = jnp.ones((cfg.depth, cfg.num_heads))
    frac = flops_fraction(s, r, scores2, 1.0, table, cfg)
    assert abs(float(frac) - 1.0) < 1e-6


def test_fraction_decreases_with_pruning():
    cfg = get_config("deit_tiny_patch16_224")
    table = build_macs_table(cfg)
    scores2 = jnp.arange(cfg.depth * cfg.num_heads, dtype=jnp.float32
                         ).reshape(cfg.depth, cfg.num_heads)
    s0 = jnp.zeros((cfg.depth, 2))
    r0 = jnp.zeros((cfg.depth, cfg.num_heads))
    dense = float(flops_fraction(s0, r0, scores2, 1.0, table, cfg))
    s1 = s0.at[:, 0].set(1.0)   # remove one head per layer
    f1 = float(flops_fraction(s1, r0, scores2, 1.0, table, cfg))
    s2 = s1.at[:, 1].set(cfg.mlp_hidden / 2)  # remove half the MLP units
    f2 = float(flops_fraction(s2, r0, scores2, 1.0, table, cfg))
    assert f1 < dense and f2 < f1


def test_fraction_half_heads_analytic():
    """Removing half the heads everywhere (no r, no gating) scales the
    qkv + qk columns by 1/2 and removes d/2 proj input dims."""
    cfg = get_config("deit_small_patch16_224")  # H=6
    table = build_macs_table(cfg)
    l, h = cfg.depth, cfg.num_heads
    scores2 = jnp.tile(jnp.arange(h, dtype=jnp.float32), (l, 1))
    s = jnp.zeros((l, 2)).at[:, 0].set(h / 2)
    r = jnp.zeros((l, h))
    frac = float(flops_fraction(s, r, scores2, 1.0, table, cfg))
    m01 = table.m01.sum()
    m23 = table.m23.sum()
    m45 = table.m45.sum()
    expected = 2 * (table.embed + 0.5 * m01 + 0.5 * m23 + m45) \
        / table.dense_flops
    assert abs(frac - expected) < 1e-6


def test_block_gating_scales_blocks():
    cfg = get_config("deit_tiny_patch16_224")
    table = build_macs_table(cfg)
    s = jnp.zeros((cfg.depth, 2))
    r = jnp.zeros((cfg.depth, cfg.num_heads))
    scores2 = jnp.ones((cfg.depth, cfg.num_heads))
    distrib = jnp.full((cfg.depth,), 0.5)
    frac = float(flops_fraction(s, r, scores2, distrib, table, cfg))
    expected = 2 * (table.embed + 0.5 * table.block.sum()) / table.dense_flops
    assert abs(frac - expected) < 1e-6


def test_gradient_flows_through_ste():
    cfg = get_config("deit_tiny_patch16_224")
    table = build_macs_table(cfg)
    scores2 = jnp.ones((cfg.depth, cfg.num_heads))

    def f(s, r):
        return flops_fraction(s, r, scores2, 1.0, table, cfg)

    s = jnp.zeros((cfg.depth, 2))
    r = jnp.full((cfg.depth, cfg.num_heads), 0.3)
    gs, gr = jax.grad(f, argnums=(0, 1))(s, r)
    # removing a head / unit reduces FLOPs => negative gradient
    assert np.all(np.asarray(gs) < 0)
    assert np.all(np.asarray(gr) < 0)

    # with ceil(s0)=1 the bottom head per layer counts as fully pruned and
    # its r must receive zero gradient (uvc_utils.py:428-433); scores2 is
    # ascending so head 0 is the pruned one.
    s2 = s.at[:, 0].set(0.3)
    _, gr2 = jax.grad(f, argnums=(0, 1))(s2, r)
    gr2 = np.asarray(gr2)
    assert np.all(gr2[:, 0] == 0.0)
    assert np.all(gr2[:, 1:] < 0.0)


def test_t2t_table_builds():
    table = build_macs_table(get_config("t2t_vit_14"))
    assert table.block.shape == (14, 6)
    assert table.embed > 0
    # dense_flops is 2*MACs (calc_flops returns 2*MACs: uvc_utils.py:462);
    # t2t_vit_14 is ~4.8G MACs (paper reports ~5.2G counting the backbone
    # only), so dense FLOPs land near 9.5G
    macs = table.dense_flops / 2.0
    assert 4e9 < macs < 6e9
    np.testing.assert_allclose(
        table.dense_flops, 2.0 * (table.embed + table.block.sum()), rtol=1e-6)


def test_flops2_hand_computed():
    """flops2 (uvc_utils.py:95-125) on the testing config:
    d=8, H=1, head_size=8, d_ff=32, L=1 => ub = (2*32*8+8) + (2*8*8+8)."""
    import jax.numpy as jnp
    from uvc_tpu.compress.resource import flops2_fraction
    from uvc_tpu.configs import get_config
    cfg = get_config("testing")
    ub = (2 * 32 * 8 + 8) + (2 * 8 * 8 + 8)  # 656
    scores2 = jnp.ones((1, 1))

    z2 = jnp.zeros((1, 2))
    zr = jnp.zeros((1, 1))
    assert float(flops2_fraction(z2, zr, scores2, cfg)) == 1.0

    # remove 4 MLP units + 2 dims of the (kept) head
    s = jnp.array([[0.0, 4.0]])
    r = jnp.array([[2.0]])
    want = ((2 * (32 - 4) * 8 + 8) + (2 * (8 - 2) * 8 + 8)) / ub
    np.testing.assert_allclose(float(flops2_fraction(s, r, scores2, cfg)),
                               want, rtol=1e-6)

    # prune the whole (only) head: its r no longer subtracts
    s = jnp.array([[1.0, 0.0]])
    r = jnp.array([[3.0]])
    want = ((2 * 32 * 8 + 8) + (2 * (8 - 8) * 8 + 8)) / ub
    np.testing.assert_allclose(float(flops2_fraction(s, r, scores2, cfg)),
                               want, rtol=1e-6)


def test_flops2_gradients():
    """STE grads: d/ds1 = -2d/ub, d/dr = -2d/ub for kept heads, 0 for
    pruned heads; d/ds0 = -2*d*head_size/ub (uvc_utils.py:103-123)."""
    import jax
    import jax.numpy as jnp
    from uvc_tpu.compress.resource import flops2_fraction
    from uvc_tpu.configs import get_config
    cfg = get_config("testing")
    ub = 656.0
    scores2 = jnp.ones((1, 1))

    s = jnp.array([[0.0, 4.0]])
    r = jnp.array([[2.0]])
    gs, gr = jax.grad(lambda s_, r_: flops2_fraction(s_, r_, scores2, cfg),
                      argnums=(0, 1))(s, r)
    np.testing.assert_allclose(gs[0, 0], -2 * 8 * 8 / ub, rtol=1e-5)
    np.testing.assert_allclose(gs[0, 1], -2 * 8 / ub, rtol=1e-5)
    np.testing.assert_allclose(gr[0, 0], -2 * 8 / ub, rtol=1e-5)

    # pruned head: r gradient vanishes
    s = jnp.array([[1.0, 0.0]])
    gr = jax.grad(lambda r_: flops2_fraction(s, r_, scores2, cfg))(r)
    np.testing.assert_allclose(gr[0, 0], 0.0, atol=1e-8)
