"""StepProfiler (utils/profiler.py) — windowed XLA trace capture.

Beyond-reference observability: the reference has no device profiler
hook at all (SURVEY.md §5 lists inline MACs accounting + tqdm as its
only tracing)."""

import argparse
import glob
import os

import jax.numpy as jnp

from uvc_tpu.utils import profiler as prof


def test_capture_window_writes_trace(tmp_path):
    p = prof.StepProfiler(str(tmp_path), start_step=2, num_steps=3)
    for step in range(8):
        p.step(step)
        if step == 2:
            assert p.active, "trace must start once step >= start_step"
        # some device work so the trace has content
        jnp.sum(jnp.ones((16, 16)) @ jnp.ones((16, 16))).block_until_ready()
        if step >= 5:
            assert not p.active, "trace must stop once step >= stop_step"
    p.close()
    assert p.done
    # jax writes xplane protos under plugins/profile/<timestamp>/
    files = glob.glob(os.path.join(str(tmp_path), "**", "*.xplane.pb"),
                      recursive=True)
    assert files, "no trace artifacts written"


def test_close_stops_unfinished_window(tmp_path):
    p = prof.StepProfiler(str(tmp_path), start_step=0, num_steps=100)
    p.step(0)
    assert p.active
    jnp.ones((4, 4)).block_until_ready()
    p.close()   # run ended before the window did
    assert not p.active and p.done
    assert glob.glob(os.path.join(str(tmp_path), "**", "*.xplane.pb"),
                     recursive=True)


def test_start_failure_disables_not_raises(tmp_path, monkeypatch):
    import jax
    def boom(*a, **k):
        raise RuntimeError("backend rejects tracing")
    monkeypatch.setattr(jax.profiler, "start_trace", boom)
    p = prof.StepProfiler(str(tmp_path), start_step=0, num_steps=5)
    p.step(0)   # must not raise
    assert p.done and not p.active
    p.step(1)   # inert afterwards
    p.close()


def test_from_args():
    ns = argparse.Namespace(profile_dir=None)
    assert prof.from_args(ns) is None
    ns = argparse.Namespace(profile_dir="/tmp/x", profile_start=3,
                            profile_steps=7)
    p = prof.from_args(ns)
    assert (p.trace_dir, p.start_step, p.stop_step) == ("/tmp/x", 3, 10)


def test_inert_when_no_dir():
    p = prof.StepProfiler(None)
    for s in range(20):
        p.step(s)
    p.close()
    assert p.done and not p.active
