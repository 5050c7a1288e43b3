"""Tracing and profiling.

The reference declares langsmith "observability" but never uses it
(SURVEY.md section 5.1); the only timing is duration stamps in telemetry.
Here tracing is first-class and TPU-aware:

- ``StageTimer``: lightweight per-stage wall-clock timing for pipelines;
  stages nest, results are a flat dict of milliseconds suitable for telemetry
  or response meta.
- ``profiler_trace``: context manager around ``jax.profiler.trace`` that
  captures a TensorBoard-compatible device trace (XLA ops, HBM, DMA) for any
  code region — the tool for finding whether a query is compute-, transfer-,
  or dispatch-bound.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from pathlib import Path
from typing import ContextManager, Dict

from ..logger import get_logger

log = get_logger("utils.tracing")


class StageTimer:
    """Accumulates wall-clock per stage: ``with timer.stage("embed"): ...``"""

    def __init__(self) -> None:
        self._totals: Dict[str, float] = {}

    @contextmanager
    # annotated as the decorated callable's public type (what callers
    # and runtime checkers see), not the generator convention
    def stage(self, name: str) -> ContextManager[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = (time.perf_counter() - start) * 1000.0
            self._totals[name] = self._totals.get(name, 0.0) + elapsed

    def as_dict(self) -> Dict[str, float]:
        return {k: round(v, 3) for k, v in self._totals.items()}

    def reset(self) -> None:
        self._totals.clear()


@contextmanager
def profiler_trace(
    log_dir: Path, *, host_tracer_level: int = 2
) -> ContextManager[None]:
    """Capture a jax.profiler device trace into ``log_dir`` (TensorBoard)."""
    import jax

    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    log.info("profiler_trace_started", log_dir=str(log_dir))
    with jax.profiler.trace(str(log_dir)):
        yield
    log.info("profiler_trace_done", log_dir=str(log_dir))
