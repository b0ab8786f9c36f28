"""Tracing / profiling utilities.

The reference's observability is a steady_clock DEBUG log
(perception_node.cpp:684-688) plus an external trtexec recommendation
(SURVEY §5). Here:

- ``trace(logdir)``: jax.profiler trace context — open the result in
  TensorBoard/XProf for per-op TPU timing (the trtexec --verbose analogue).
- ``annotate(name)``: TraceAnnotation for custom spans inside traces.
- ``Timer``: wall-clock span accumulator with summary stats for host-side
  phases (data loading, eval, ...).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/unina_trace"):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock timer: ``with timer("phase"): ...``."""

    def __init__(self) -> None:
        self._acc: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, vals in self._acc.items():
            out[name] = {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_ms": sum(vals) / len(vals) * 1e3,
                "max_ms": max(vals) * 1e3,
            }
        return out
