"""Profiling / tracing helpers.

Capability of the reference's instrumentation (SURVEY.md section 5.1):
warmup-aware data/compute/eval s-per-iter breakdown (the log format lives in
``engine.trainer.evaluate_dataset``), plus TPU-native extras: ``jax.profiler``
trace capture and a simple step timer context.
"""

from __future__ import annotations

import contextlib
import time


class StepTimer:
    """Warmup-aware running averages of named phases (reference
    ``trainer.py:1265-1336`` semantics: first ``warmup`` iterations are
    excluded from the averages)."""

    def __init__(self, warmup: int = 5):
        self.warmup = warmup
        self.counts = 0
        self.totals = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if self.counts >= self.warmup:
                self.totals[name] = self.totals.get(name, 0.0) + dt

    def step(self):
        self.counts += 1

    def averages(self) -> dict:
        n = max(self.counts - self.warmup, 1)
        return {k: v / n for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
