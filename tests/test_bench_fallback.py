"""bench.py fallback observability (VERDICT r3 weak #3 / ADVICE r3).

Three guarantees:
  1. a compile failure of the blend fusion records the *stage* string
     ("blend"), not a bare True;
  2. a failure of the whole round-3 stack records "round2";
  3. the headline row's fallback propagates to the TOP-LEVEL report JSON
     (the driver only reads the top level round-over-round);
and in every case the kernel-switch module globals are restored after
bench_model returns (a per-config fallback must not leak into later
configs in the same process).
"""

import json

import jax.numpy as jnp
import pytest

import bench
from uvc_tpu.models import vit as vit_mod
from uvc_tpu.ops import performer as perf_mod


def _fake_step_factory(fail_while):
    """build_stage1_step stand-in: raises while `fail_while()` is true,
    otherwise returns a trivial (state, metrics) step."""

    def build(cfg, table, hp, thp, **kw):
        def step(state, teacher, xs, ys, *rest):
            if fail_while():
                raise RuntimeError("forced Mosaic compile failure")
            return state, {"loss": jnp.zeros((1,))}

        return step

    return build


@pytest.fixture
def _flags_snapshot():
    saved = (vit_mod._FUSED_BLEND, vit_mod._FUSED_MLP,
             vit_mod._FUSED_ATTN_LN, perf_mod._MERGED_DEFAULT)
    vit_mod._FUSED_BLEND = True
    vit_mod._FUSED_MLP = True
    vit_mod._FUSED_ATTN_LN = True
    perf_mod._MERGED_DEFAULT = True
    yield saved
    (vit_mod._FUSED_BLEND, vit_mod._FUSED_MLP,
     vit_mod._FUSED_ATTN_LN, perf_mod._MERGED_DEFAULT) = saved


def _run_bench_model(monkeypatch, fail_while):
    import uvc_tpu.train.step as step_mod

    monkeypatch.setattr(step_mod, "build_stage1_step",
                        _fake_step_factory(fail_while))
    return bench.bench_model("testing", 2, 1, on_tpu=False)


def test_blend_stage_recorded(monkeypatch, _flags_snapshot):
    out = _run_bench_model(
        monkeypatch, lambda: vit_mod._FUSED_BLEND)
    assert out["kernel_fallback"] == "blend"
    # flags restored despite the in-call mutation
    assert vit_mod._FUSED_BLEND is True
    assert vit_mod._FUSED_MLP is True


def test_round2_stage_recorded(monkeypatch, _flags_snapshot):
    out = _run_bench_model(
        monkeypatch, lambda: vit_mod._FUSED_MLP)
    assert out["kernel_fallback"] == "round2"
    assert vit_mod._FUSED_MLP is True
    assert vit_mod._FUSED_ATTN_LN is True
    assert perf_mod._MERGED_DEFAULT is True


def test_no_fallback_no_flag(monkeypatch, _flags_snapshot):
    out = _run_bench_model(monkeypatch, lambda: False)
    assert "kernel_fallback" not in out


def test_headline_fallback_propagates_to_top_level(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "bench_model",
        lambda *a, **k: {"img_per_sec": 1.0, "vs_baseline": 1.0,
                         "mfu": 0.1, "kernel_fallback": "blend"})
    bench.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["kernel_fallback"] == "blend"
    assert report["value"] == 1.0
