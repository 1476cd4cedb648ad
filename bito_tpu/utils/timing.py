"""Stopwatch + device profiling hooks.

TPU-native rebuild of the reference Stopwatch/ProgressBar instrumentation
(reference: src/stopwatch.hpp:3-12, laps used in src/nni_engine.cpp:230-257
and src/gp_instance.cpp:303-309) plus jax.profiler trace capture for device
timelines (SURVEY §5.1's "jax profiler traces + per-phase timers").
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class Stopwatch:
    """Lap/total timer (reference Stopwatch semantics)."""

    def __init__(self, start: bool = True):
        self._start: Optional[float] = None
        self._laps: List[float] = []
        self._last: Optional[float] = None
        if start:
            self.start()

    def start(self):
        self._start = self._last = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        assert self._last is not None, "Stopwatch not started"
        lap = now - self._last
        self._laps.append(lap)
        self._last = now
        return lap

    def stop(self) -> float:
        return self.lap()

    def total(self) -> float:
        assert self._start is not None
        return time.perf_counter() - self._start

    @property
    def laps(self) -> List[float]:
        return list(self._laps)


class PhaseTimer:
    """Named-phase accumulator for engine loops (the NNI engine's per-stage
    lap report, reference src/nni_engine.cpp:230-257)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["# Timing Report"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name}: {total:.3f}s over {self.counts[name]} calls"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax profiler trace (viewable in TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree):
    """Barrier helper for timing device work accurately."""
    import jax

    return jax.block_until_ready(tree)
