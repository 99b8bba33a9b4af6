"""Tracing/profiling utilities.

The reference has no systematic profiling (SURVEY.md §5.1 — tqdm bars and
ad-hoc wall-clock prints). Here: a per-stage timing struct every CLI can
use, plus a ``jax.profiler`` trace context for TPU timeline capture
(view in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)


class StageTimer:
    """Accumulates named wall-clock spans; JSON-serializable report.

    Note: device work is async — wrap the timed region's outputs with
    ``jax.block_until_ready`` (or force a host readback on tunneled
    runtimes) before exiting the span for honest numbers.
    """

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {
            name: {"total_s": round(total, 4),
                   "count": self.counts[name],
                   "mean_ms": round(total / self.counts[name] * 1e3, 3)}
            for name, total in sorted(self.spans.items(),
                                      key=lambda kv: -kv[1])
        }

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.report(), indent=2))

    def log_report(self) -> None:
        for name, row in self.report().items():
            log.info("timing %-30s total %8.3fs  n=%-5d mean %8.3f ms",
                     name, row["total_s"], row["count"], row["mean_ms"])


@contextlib.contextmanager
def trace_to(trace_dir: Optional[str | Path]):
    """``jax.profiler`` trace context; no-op when ``trace_dir`` is None."""
    if trace_dir is None:
        yield
        return
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        yield
    log.info("profiler trace written to %s", trace_dir)
