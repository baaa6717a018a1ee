"""Tracing / profiling helpers — the debug-utils-label analog.

The reference wraps every pass and barrier in Vulkan debug-utils label ranges
for RenderDoc capture (vulkan/mod.rs:363-383; applied per pass at
render_graph/mod.rs:581-611). Here the equivalents are:

- ``pass_scope(name)`` → ``jax.named_scope`` + ``jax.profiler.TraceAnnotation``
  so passes show up in XLA/perfetto traces (graph/graph.py applies it to every
  pass automatically).
- ``trace(logdir)`` → context manager around ``jax.profiler`` for device
  traces viewable in TensorBoard/XProf.
- ``FrameTimer`` → host-side rolling per-frame timing with percentiles (the
  meshopt harness's msec printouts, meshopt/meshopt.rs:381-393).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def pass_scope(name: str):
    """Label a region for both the XLA compiler and the host profiler."""
    with jax.named_scope(name):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Rolling frame-time statistics (blocks on device completion)."""

    def __init__(self, window: int = 120):
        self.samples: deque = deque(maxlen=window)
        self._t0 = None

    def begin(self):
        self._t0 = time.perf_counter()

    def end(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        self.samples.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.samples) / max(len(self.samples), 1)

    @property
    def fps(self) -> float:
        m = sum(self.samples) / max(len(self.samples), 1)
        return 1.0 / m if m > 0 else 0.0

    def percentile_ms(self, p: float) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        i = min(len(s) - 1, int(p / 100.0 * len(s)))
        return 1e3 * s[i]

    def report(self) -> str:
        return (
            f"{self.mean_ms:.2f} ms/frame ({self.fps:.1f} fps), "
            f"p50 {self.percentile_ms(50):.2f} ms, p99 {self.percentile_ms(99):.2f} ms"
        )
