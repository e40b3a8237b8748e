"""Per-stage wall-clock timing and JAX profiler hooks.

Counterpart of the reference's ``performance_measure`` context manager
(vmap.py:17-29), extended with aggregation and an optional
``jax.profiler`` trace capture for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates per-stage wall time; ``report()`` prints and resets."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, reset: bool = True) -> dict[str, float]:
        if not self.enabled:
            return {}
        out = {}
        for name, total in sorted(self.totals.items()):
            ms = 1000.0 * total / max(self.counts[name], 1)
            out[name] = ms
            print(f"{name}: {ms:.2f} ms")
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out


@contextlib.contextmanager
def performance_measure(name: str):
    """Drop-in analogue of the reference's context manager."""
    t0 = time.perf_counter_ns()
    yield
    dt = (time.perf_counter_ns() - t0) / 1e6
    print(f"{name} execution time: {dt:.2f} ms")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
