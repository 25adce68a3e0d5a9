"""Profiling utilities (SURVEY.md §5 tracing/profiling).

The reference delegated to lightning's SimpleProfiler (per-hook wall times,
train.py:178) and cudnn autotune. TPU-native equivalents:
  * PhaseTimer — accumulates wall time per named phase, printed as a table
    at teardown (the SimpleProfiler analogue; enabled by default in
    NeRFSystem.fit).
  * trace() — context manager around jax.profiler.trace, dumping an XPlane
    trace viewable in TensorBoard's profile plugin / xprof
    (enable with train.py --profile_dir).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Accumulate wall-clock time per phase; render a summary table."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return "(no phases recorded)"
        width = max(len(k) for k in self.totals)
        lines = [f"{'phase'.ljust(width)} |    total |    count |     mean",
                 "-" * (width + 36)]
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name.ljust(width)} | {total:7.2f}s | "
                         f"{n:8d} | {total / n:7.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
