"""ResNetV2 hybrid stem for R50+ViT (reference: models/modeling_resnet.py).

Pre-activation bottlenecks with weight-standardized convolutions and
GroupNorm(32), NHWC layout (TPU-native conv layout), HWIO kernels (the
format the upstream jax .npz checkpoints already use — np2th converts them
to torch OIHW at modeling_resnet.py:28-33; here they load verbatim).

Architecture (modeling_resnet.py:129-164): 7x7/2 std-conv root + 3x3/2
max-pool, then blocks (3, 4, 9) x PreActBottleneck with strides (1, 2, 2),
width 64 * width_factor, output channels width * 16, total stride 16.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def std_conv(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """Weight-standardized conv (StdConv2d, modeling_resnet.py:36-43):
    kernel normalized over (H, W, I) per output channel, eps 1e-5.

    Padding is the torch convention — symmetric (k-1)//2 on both sides —
    NOT XLA 'SAME': for stride-2 convs SAME pads asymmetrically (0, 1),
    shifting every window by one pixel relative to the reference."""
    w32 = w.astype(jnp.float32)
    m = jnp.mean(w32, axis=(0, 1, 2), keepdims=True)
    v = jnp.var(w32, axis=(0, 1, 2), keepdims=True)
    w = ((w32 - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)
    p = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               groups: int = 32, eps: float = 1e-6) -> jax.Array:
    b, h, w, c = x.shape
    g = groups if c % groups == 0 else c
    x32 = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    return (y * scale + bias).astype(x.dtype)


def _conv_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout)) * math.sqrt(2.0 / fan)


def _gn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def init_bottleneck(key, cin: int, cout: int, cmid: int,
                    stride: int = 1) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, cmid), "gn1": _gn_init(cmid),
        "conv2": _conv_init(ks[1], 3, 3, cmid, cmid), "gn2": _gn_init(cmid),
        "conv3": _conv_init(ks[2], 1, 1, cmid, cout), "gn3": _gn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["conv_proj"] = _conv_init(ks[3], 1, 1, cin, cout)
        p["gn_proj"] = _gn_init(cout)
    return p


def apply_bottleneck(p: dict, x: jax.Array, stride: int = 1) -> jax.Array:
    """PreActBottleneck forward (modeling_resnet.py:79-92).  Note the
    reference's projection GroupNorm uses num_groups == channels
    (nn.GroupNorm(cout, cout): modeling_resnet.py:76) — i.e. InstanceNorm;
    replicated via groups=channels."""
    residual = x
    if "conv_proj" in p:
        residual = std_conv(x, p["conv_proj"], stride)
        residual = group_norm(residual, p["gn_proj"]["scale"],
                              p["gn_proj"]["bias"],
                              groups=residual.shape[-1])
    y = jax.nn.relu(group_norm(std_conv(x, p["conv1"]), p["gn1"]["scale"],
                               p["gn1"]["bias"]))
    y = jax.nn.relu(group_norm(std_conv(y, p["conv2"], stride),
                               p["gn2"]["scale"], p["gn2"]["bias"]))
    y = group_norm(std_conv(y, p["conv3"]), p["gn3"]["scale"],
                   p["gn3"]["bias"])
    return jax.nn.relu(residual + y)


def init_resnet_stem(key, block_units: Sequence[int] = (3, 4, 9),
                     width_factor: int = 1) -> dict:
    width = 64 * width_factor
    keys = iter(jax.random.split(key, sum(block_units) + 1))
    p = {"conv_root": _conv_init(next(keys), 7, 7, 3, width),
         "gn_root": _gn_init(width)}
    cins = [(width, width * 4, width, 1),
            (width * 4, width * 8, width * 2, 2),
            (width * 8, width * 16, width * 4, 2)]
    for bi, n_units in enumerate(block_units):
        cin, cout, cmid, stride = cins[bi]
        units = []
        for u in range(n_units):
            units.append(init_bottleneck(
                next(keys), cin if u == 0 else cout, cout, cmid,
                stride if u == 0 else 1))
        p[f"block{bi + 1}"] = units
    return p


def apply_resnet_stem(p: dict, x: jax.Array,
                      block_units: Sequence[int] = (3, 4, 9)) -> jax.Array:
    """Root (7x7/2 conv, GN, relu, 3x3/2 maxpool VALID) + 3 stages.
    Input [B, H, W, 3] -> [B, H/16, W/16, width*16]."""
    x = std_conv(x, p["conv_root"], stride=2)
    x = jax.nn.relu(group_norm(x, p["gn_root"]["scale"],
                               p["gn_root"]["bias"]))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)])
    for bi, n_units in enumerate(block_units):
        units = p[f"block{bi + 1}"]
        for u in range(n_units):
            stride = (2 if u == 0 and bi > 0 else 1)
            x = apply_bottleneck(units[u], x, stride)
    return x
