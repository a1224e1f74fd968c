"""Reproduce the r3 blend-fusion compile failure on the real chip.

BENCH_r03 recorded "fused compile failed (JaxRuntimeError); retrying
without the blend fusion" on the DeiT-Tiny row (B=512).  This isolates
the blend kernels (fwd, bwd-full, bwd-lite) at each family's bench shape
and reports compile+run status per call, so the failing (kernel, width,
group) triple is pinned down instead of guessed.

Usage: timeout 900 python scripts/tpu_blend_repro.py [tiny small base]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uvc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/tmp/uvc_jaxcache")

from uvc_tpu.ops import mlp as M  # noqa: E402

SHAPES = {
    # (batch, d, f) at the bench batch sizes; np_=208 after _pad_rows(197)
    "tiny": (512, 192, 768),
    "small": (256, 384, 1536),
    "base": (128, 768, 3072),
}


def _report(name, fn):
    t0 = time.time()
    try:
        out = fn()
        leaves = jax.tree.leaves(out)
        float(jax.device_get(leaves[0].ravel()[0]))
        print(f"  {name}: OK ({time.time()-t0:.1f}s)")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:300]
        print(f"  {name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    fams = sys.argv[1:] or list(SHAPES)
    np_ = 208
    for fam in fams:
        b, d, f = SHAPES[fam]
        print(f"== {fam}: B={b} d={d} f={f} np={np_}")
        gf = M._mlp_blend_fwd_group(b, d, f, np_)
        gb = M._mlp_blend_bwd_group(b, d, f, np_, full=True)
        gl = M._mlp_blend_bwd_group(b, d, f, np_, full=False)
        print(f"  groups: fwd={gf} bwd_full={gb} bwd_lite={gl}")
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, np_, d), jnp.bfloat16)
        xin = jax.random.normal(jax.random.PRNGKey(1), (b, np_, d),
                                jnp.bfloat16)
        do = jax.random.normal(jax.random.PRNGKey(2), (b, np_, d),
                               jnp.bfloat16)
        dist = jnp.asarray([0.3, 0.7], jnp.float32)
        g2 = jnp.ones((d,), jnp.float32)
        b2 = jnp.zeros((d,), jnp.float32)
        wfc1 = (jax.random.normal(jax.random.PRNGKey(3), (d, f)) * 0.02
                ).astype(jnp.bfloat16)
        bfc1 = jnp.zeros((f,), jnp.bfloat16)
        wfc2 = (jax.random.normal(jax.random.PRNGKey(4), (f, d)) * 0.02
                ).astype(jnp.bfloat16)
        bfc2 = jnp.zeros((d,), jnp.bfloat16)
        mask = jnp.ones((f,), jnp.bfloat16)

        _report("blend_fwd", lambda: jax.jit(
            lambda *a: M._call_mlp_blend_fwd(*a, 1e-6))(
            x, xin, dist, g2, b2, wfc1, bfc1, wfc2, bfc2, mask))
        if gb is not None:
            _report("blend_bwd_full(unsplit)", lambda: jax.jit(
                lambda *a: M._call_mlp_blend_bwd(*a, 1e-6, gb, full=True))(
                x, xin, dist, g2, b2, wfc1, bfc1, wfc2, bfc2, mask, do))
        # the custom_vjp end-to-end path (what the train step traces)
        _report("blend_vjp_e2e", lambda: jax.jit(jax.grad(
            lambda xx: jnp.sum(M.fused_mlp_ln_blend(
                xx, xin, dist, g2, b2, wfc1, bfc1, wfc2, bfc2, mask,
                eps=1e-6).astype(jnp.float32))))(x))
        # hidden-split path at f//2 (what small/base actually take)
        for ng in (2, 4):
            fg = f // ng
            gbs = M._mlp_blend_bwd_group(b, d, fg, np_, full=True)
            gls = M._mlp_blend_bwd_group(b, d, fg, np_, full=False)
            if gbs is None:
                continue
            print(f"  split ng={ng}: fg={fg} g_full={gbs} g_lite={gls}")
            _report(f"blend_bwd_full(split/{ng})", lambda: jax.jit(
                lambda *a: M._call_mlp_blend_bwd(*a, 1e-6, gbs, full=True))(
                x, xin, dist, g2, b2, wfc1[:, :fg], bfc1[:fg],
                wfc2[:fg, :], bfc2, mask[:fg], do))
            _report(f"blend_bwd_lite(split/{ng})", lambda: jax.jit(
                lambda xx, dd, *a: M._call_mlp_blend_bwd(
                    xx, None, dd, *a, 1e-6, gls, full=False))(
                x, dist, g2, b2, wfc1[:, :fg], bfc1[:fg],
                wfc2[:fg, :], None, mask[:fg], do))
            break


if __name__ == "__main__":
    main()
