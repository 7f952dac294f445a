"""Profiling / tracing helpers (aux subsystem; SURVEY.md §5.1).

The reference only wall-clocks batches with AverageMeter; here profiling is
first-class: ``trace()`` wraps a region in a ``jax.profiler`` trace viewable
in TensorBoard/Perfetto, and ``fps_meter`` provides the tracking-FPS meter
the benchmark and CLIs report.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

from mmmot_tpu.utils.meters import AverageMeter


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mmmot_trace") -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FpsMeter:
    """Frames-per-second meter over jitted calls (excludes first/compile)."""

    def __init__(self):
        self._meter = AverageMeter()
        self._calls = 0

    @contextlib.contextmanager
    def measure(self, frames: int) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._calls += 1
        if self._calls > 1:      # skip the compile call
            self._meter.update(frames / dt)

    @property
    def fps(self) -> float:
        return self._meter.avg
