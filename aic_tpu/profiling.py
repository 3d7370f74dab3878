"""Profiling surface: per-subsystem wall timings + device trace capture.

Role of the reference's tracing/profiling apparatus (SURVEY §5: `trace`
spans over step phases, wgpu timestamp queries, info-text overlay): a
lightweight span timer that subsystems report into, an aggregated
frame/step report (the info-text payload), and a wrapper around
`jax.profiler` for capturing real device traces (the analog of wgpu's
GPU timestamp queries — per-kernel timings come from the trace viewer).

Usage:
    prof = Profiler()
    with prof.span("relight"):
        ...
    print(prof.report())

    with device_trace("/tmp/trace"):   # real per-kernel device profile
        run_workload()
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class SpanStats:
    calls: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)


@dataclass
class Profiler:
    """Hierarchical span timer with EWMA per-span (TimeStats role)."""

    spans: dict = field(default_factory=lambda: defaultdict(SpanStats))
    _stack: list = field(default_factory=list)

    @contextlib.contextmanager
    def span(self, name: str):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.spans[full].add(time.perf_counter() - t0)

    def report(self) -> str:
        """Info-text style report, longest-total first."""
        rows = sorted(self.spans.items(), key=lambda kv: -kv[1].total_s)
        lines = [
            f"{name:<28} {st.calls:>5}x  total {st.total_s * 1e3:8.1f} ms"
            f"  max {st.max_s * 1e3:7.1f} ms"
            for name, st in rows
        ]
        return "\n".join(lines)

    def reset(self) -> None:
        self.spans.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax device profile (per-kernel timings, HBM traffic) to
    `log_dir` for the trace viewer — the wgpu timestamp-query analog."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
