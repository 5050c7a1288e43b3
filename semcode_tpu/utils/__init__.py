"""Cross-cutting utilities: tracing/profiling helpers."""

from .tracing import StageTimer, profiler_trace

__all__ = ["StageTimer", "profiler_trace"]
