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
    """Accumulates wall time by stage; report() returns ms totals + counts.

    Nested stages account EXCLUSIVELY: a parent stage's total excludes time
    spent inside child stages opened within it, so the report's stage sum
    equals the wall time of the covered regions (no double counting) —
    which is what makes "stages sum to >=95% of e2e" a meaningful check.
    """

    def __init__(self):
        self._total = defaultdict(float)
        self._count = defaultdict(int)
        self._child = [0.0]  # per-open-stage accumulated child time

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        self._child.append(0.0)
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            child = self._child.pop()
            self._total[name] += dt - child
            self._count[name] += 1
            self._child[-1] += dt

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
        self._child = [0.0]


def start_trace(log_dir: str):
    import jax.profiler

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax.profiler

    jax.profiler.stop_trace()
