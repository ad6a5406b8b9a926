"""Per-stage timing + device tracing for the query pipeline.

SURVEY.md §5.1: the reference's observability is per-query RetrievalMetrics;
the TPU equivalent adds stage-level wall timings (condense / embed / top-k /
rerank) attached to every query's metrics and optional ``jax.profiler``
traces for deep dives.
"""

from __future__ import annotations

import contextlib
import time


class StageTimer:
    """Collects stage → milliseconds for one query."""

    def __init__(self):
        self.timings_ms: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings_ms[name] = round(
                self.timings_ms.get(name, 0.0) + (time.perf_counter() - t0) * 1e3, 2
            )

    def to_dict(self) -> dict:
        total = round(sum(self.timings_ms.values()), 2)
        return {**self.timings_ms, "total_ms": total}


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace when a log dir is configured, no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
