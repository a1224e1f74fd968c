"""XLA profiler capture for a window of training steps.

Beyond-reference observability: the reference's only tracing is the
inline MACs accounting + tqdm progress bars (SURVEY.md §5 — it has no
device profiler hook at all).  ``--profile_dir`` captures a
TensorBoard-loadable XLA trace (``jax.profiler``) over a step window
that starts after compilation has settled, so the trace shows
steady-state device time instead of the first-compile wall.  View with
``tensorboard --logdir <profile_dir>`` (the TensorBoard "profile" tab
reads the xplane protos jax writes).
"""

from __future__ import annotations

from typing import Optional


class StepProfiler:
    """Start/stop a ``jax.profiler`` trace around a global-step window.

    Drivers call :meth:`step` once per loop iteration with the current
    global step, and :meth:`close` when training ends (which also stops
    a window the run never outlasted).  Inert when ``trace_dir`` is
    None.  Capture failures degrade to a logged warning and disable the
    profiler — profiling must never kill a run (some relayed PJRT
    backends reject host tracing).
    """

    def __init__(self, trace_dir: Optional[str] = None,
                 start_step: int = 10, num_steps: int = 5, logger=None):
        self.trace_dir = trace_dir
        self.start_step = int(start_step)
        self.stop_step = int(start_step) + int(num_steps)
        self.logger = logger
        self.active = False
        self.done = trace_dir is None

    def _log(self, msg: str) -> None:
        if self.logger is not None:
            self.logger.info(msg)
        else:
            print(msg)

    def step(self, global_step: int) -> None:
        """Advance the window; starts/stops the trace at its edges.

        With step bundling (steps_per_launch > 1) the driver calls this
        once per *launch*, so the window snaps outward to launch
        boundaries — the trace is a superset of the requested steps.
        """
        if self.done:
            return
        if not self.active:
            if global_step >= self.start_step:
                try:
                    import jax
                    jax.profiler.start_trace(self.trace_dir)
                    self.active = True
                    self._log(f"[profiler] trace started at step "
                              f"{global_step} -> {self.trace_dir}")
                except Exception as e:           # noqa: BLE001
                    self.done = True
                    self._log(f"[profiler] start_trace failed ({e!r}); "
                              f"profiling disabled for this run")
        elif global_step >= self.stop_step:
            self.close()

    def close(self) -> None:
        """Stop an in-flight trace (idempotent)."""
        if self.active:
            try:
                import jax
                jax.profiler.stop_trace()
                self._log(f"[profiler] trace written to {self.trace_dir}")
            except Exception as e:               # noqa: BLE001
                self._log(f"[profiler] stop_trace failed ({e!r})")
            self.active = False
        self.done = True


def from_args(args, logger=None) -> Optional[StepProfiler]:
    """Build a StepProfiler from the CLI namespace (None when off)."""
    trace_dir = getattr(args, "profile_dir", None)
    if not trace_dir:
        return None
    return StepProfiler(trace_dir, getattr(args, "profile_start", 10),
                        getattr(args, "profile_steps", 5), logger=logger)
