"""Profiling: jax.profiler traces + stage timing (the FPS-overlay analog).

The reference's only observability is the VK_LAYER_LUNARG_monitor FPS
counter (/root/reference/src/main.cpp:826-829); here a real profiler:
``trace`` wraps a block in a jax.profiler trace viewable in
TensorBoard/Perfetto, and ``StageTimer`` measures wall time of named
stages with block_until_ready fencing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with profiling.trace('/tmp/trace'): ...``"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall time per named stage, fencing device async work."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:24s} {tot * 1e3:9.2f} ms total  {tot / n * 1e3:8.3f} ms/call  x{n}")
        return "\n".join(lines)
