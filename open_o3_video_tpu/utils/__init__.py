"""Cross-cutting subsystems: metrics, profiling, checkpointing."""

from .metrics import MetricsBus
from .profiling import StageTimer, trace_annotation

__all__ = ["MetricsBus", "StageTimer", "trace_annotation"]
