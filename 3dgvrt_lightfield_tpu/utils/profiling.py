"""Tracing / profiling utilities (SURVEY.md §5 "tracing" parity).

The reference has three mechanisms: GPU timestamp query pools around the
trace dispatch (base/VulkanRTBase.cpp:1139-1147, 917-963), wall-clock FPS
windows (:901-915), and a benchmark mode (base/benchmark.hpp).  The TPU
equivalents here:

  * `trace(logdir)` — context manager around `jax.profiler` producing an
    xplane trace viewable in TensorBoard/XProf (device timeline = the
    timestamp-query analog).
  * `FrameTimer` — steady-state frame timing with a warmup, reporting
    mean/best/worst ms and fps exactly like the reference's
    `calculateFPS`/benchmark CSV. Uses a device-to-host sync per frame
    because `block_until_ready` alone is not a reliable fence on every
    backend (measured on the axon v5e tunnel).
  * `device_sync(x)` — the reliable fence.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax
import numpy as np


def device_sync(x):
    """Force completion of `x`'s computation (D2H read of one scalar)."""
    leaf = jax.tree.leaves(x)[0]
    _ = np.asarray(jax.numpy.ravel(leaf)[0])
    return x


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class FrameTimer:
    """Per-frame wall-clock timing with warmup (reference: calculateFPS)."""
    warmup: int = 2
    _times: List[float] = field(default_factory=list)
    _seen: int = 0
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)
        return False

    def frame(self, fn, *args):
        """Run fn(*args), sync, and record the frame time."""
        with self:
            out = device_sync(fn(*args))
        return out

    @property
    def frame_times_ms(self) -> np.ndarray:
        return np.asarray(self._times) * 1e3

    def summary(self) -> dict:
        t = self.frame_times_ms
        if len(t) == 0:
            return {"frames": 0}
        return {
            "frames": len(t),
            "mean_ms": float(t.mean()),
            "best_ms": float(t.min()),
            "worst_ms": float(t.max()),
            "fps": float(1e3 / t.mean()),
        }
