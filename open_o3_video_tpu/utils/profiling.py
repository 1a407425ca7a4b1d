"""Profiling hooks: stage timers + jax.profiler trace annotations.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5.1); this makes
tracing a first-class subsystem: ``StageTimer`` aggregates per-stage wall
time, ``trace_annotation`` tags device traces viewable in XProf/Perfetto,
and ``start_trace``/``stop_trace`` capture a full device profile.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace_annotation(name: str):
    """Annotate a region in the jax profiler trace (no-op overhead when no
    trace is active)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulates wall time by stage; report() returns ms totals + counts."""

    def __init__(self):
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(self._total[name], 4),
                "count": self._count[name],
                "mean_ms": round(1000 * self._total[name] / max(1, self._count[name]), 2),
            }
            for name in self._total
        }

    def reset(self):
        self._total.clear()
        self._count.clear()


def start_trace(log_dir: str):
    import jax.profiler

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax.profiler

    jax.profiler.stop_trace()
