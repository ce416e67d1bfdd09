"""Tracing/profiling hooks (SURVEY.md §5.1).

Thin wrappers over jax.profiler so the CLI/bench can trace decode/step/
readback phases with zero overhead when disabled.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(profile_dir: str = ""):
    """Capture a device+host trace (Perfetto/XPlane) if profile_dir set."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side region, visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Block-until-ready bracketed step timing (B14 telemetry)."""

    def __init__(self):
        self.samples_ms: list[float] = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.samples_ms.append((time.perf_counter() - t0) * 1e3)

    def percentile(self, q: float) -> float:
        import numpy as np

        return float(np.percentile(np.asarray(self.samples_ms), q))
