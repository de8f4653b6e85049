"""First-class profiling hooks (the reference has none — SURVEY.md §5
lists tracing/profiling as absent; this is the TPU-native replacement).

Usage:
  * ``with trace("outdir"):`` — capture a ``jax.profiler`` trace
    (viewable in TensorBoard / Perfetto) around any region.
  * trainers accept ``profile_dir`` in params: the first
    ``profile_steps`` optimization steps are traced automatically.
  * ``step_timer`` — a tiny wall-clock accumulator that forces a
    device→host sync (``float()``) so timings are correct on
    asynchronous runtimes (see verify skill: ``block_until_ready`` is
    not a true sync on the axon relay).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock timer with forced sync; keeps a running summary."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)  # device→host transfer = true sync
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self) -> dict:
        import numpy as np

        arr = np.asarray(self.times or [0.0])
        return {
            "n": len(self.times),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }
