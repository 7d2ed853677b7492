"""Profiling — the TPU analogue of the reference's Tracy instrumentation.

The reference wraps every pass in Tracy GPU timestamp zones
(src/profiling.rs, zones at src/main.rs:1642-2260). Here:

  * ``pass_scope(name)`` emits a ``jax.named_scope`` so XLA/Pallas traces
    viewed in Perfetto (via ``jax.profiler.trace``) show the same per-pass
    breakdown the reference shows in Tracy;
  * ``FrameTimer`` measures wall-clock frame times with a real
    device sync (on remote transports, ``block_until_ready`` can return
    at enqueue; the timer forces a 4-byte readback like bench.py);
  * ``trace(path)`` wraps ``jax.profiler.trace`` for capturing a
    Perfetto/XPlane trace directory.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def pass_scope(name: str):
    """Named scope for one render pass (shows up in profiler traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace (open with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x) -> None:
    """Force execution to completion: tiny readback of the first element.

    ``block_until_ready`` alone is not sufficient on tunneled platforms
    (it can return at enqueue)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


class FrameTimer:
    """Rolling frame-time statistics with true device sync."""

    def __init__(self, window: int = 60):
        self.window = window
        self.samples: list[float] = []
        self._t0 = None

    def begin(self):
        self._t0 = time.perf_counter()

    def end(self, frame_output) -> float:
        device_sync(frame_output)
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return dt

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self.samples) / max(len(self.samples), 1)

    @property
    def fps(self) -> float:
        mean = sum(self.samples) / max(len(self.samples), 1)
        return 1.0 / max(mean, 1e-9)
