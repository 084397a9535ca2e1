"""Tracing / profiling helpers.

The reference's tracing story is per-step wall-clock accumulation
(/root/reference/diffusion/gaussian_diffusion.py:183,684,708) and a
profile_kv context (diffusion/logger.py). TPU-native equivalent: the XLA
profiler (`jax.profiler`) for device traces + lightweight host-side phase
timers.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict


class PhaseTimer:
    """Accumulates wall-clock per named phase (host side)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: round(v, 4) for k, v in sorted(self.totals.items())}


@contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
