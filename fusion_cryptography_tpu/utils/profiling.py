"""Profiling helpers: jax.profiler traces + per-op wall-clock timers.

The reference's only instrumentation is wall-clock + RSS deltas in its
benchmark harness (benchmarks/benchmarks.py:25-34); here the equivalents are
first-class: ``trace(dir)`` wraps a region in a jax.profiler trace (viewable in
TensorBoard/Perfetto, with per-kernel device timings), and ``op_timer`` gives
the same mean/median summary the reference's harness printed.
"""
from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class op_timer:
    """Accumulate wall-clock samples per op name; summarize like the reference
    harness (mean/median/min per op)."""

    def __init__(self) -> None:
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "n": len(ts),
                "mean": statistics.mean(ts),
                "median": statistics.median(ts),
                "min": min(ts),
            }
            for name, ts in self.samples.items()
        }

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(
                f"{name:30s} n={s['n']:4d} min={s['min']*1e3:9.3f}ms "
                f"mean={s['mean']*1e3:9.3f}ms median={s['median']*1e3:9.3f}ms"
            )
        return "\n".join(lines)
