"""Timing + profiling utilities.

The reference only prints per-iteration wall clock (inference.py:299-316);
here: a phase timer with running averages plus jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        return " ".join(
            f"{k}: {self.last[k]:.2f}s (avg {self.mean(k):.2f}s)"
            for k in self.totals
        )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/panacea_trace", enabled: bool = True):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
