"""Tracing/profiling hooks (SURVEY.md §5.1).

Thin wrappers over jax.profiler so the CLI/bench can trace decode/step/
readback phases with zero overhead when disabled, plus the in-process
XPlane parser that turns a trace into per-step device execution spans —
the hardware-counter witness used by both the bench (runtime/benchmark.py)
and the standalone profiler report (tools/profile_step.py).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import os
import tempfile

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


def parse_xplane_device_spans(xplane_path: str):
    """Parse an XPlane dump into device-plane execution evidence.

    Returns (module_ns, per_op_ns, planes):
      module_ns — one duration per executed XLA module ("XLA Modules" line;
        one event per jitted step), the authoritative device span.
      per_op_ns — op-group name -> summed ns from the "XLA Ops" line.
        "Async XLA Ops" (DMA prefetch, e.g. scan-over-layers weight slices)
        OVERLAPS compute and is deliberately not summed.
      planes — names of the device planes that contributed.
    """
    pd = jax.profiler.ProfileData.from_file(xplane_path)
    module_ns: list[float] = []
    per_op: dict[str, float] = collections.defaultdict(float)
    planes: list[str] = []
    for plane in pd.planes:
        name = plane.name
        if not ("TPU" in name and "device" in name.lower()):
            continue
        planes.append(name)
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ns.extend(ev.duration_ns for ev in line.events)
            elif line.name == "XLA Ops":
                for ev in line.events:
                    op = ev.name.split(" = ")[0].lstrip("%")
                    # collapse ssa suffixes: fusion.123 -> fusion
                    op = op.rstrip("0123456789").rstrip(".")
                    per_op[op] += ev.duration_ns
    return module_ns, dict(per_op), planes


def profiled_step_device_ms(run_steps, min_events: int = 4):
    """Median on-device execution span (ms) of one jitted step, or None.

    run_steps() must dispatch N identical jitted steps and drain them
    (readback) before returning. The trace is parsed in-process; returns
    None when no TPU device plane exists (CPU backend) or the profiler
    produced nothing usable — callers fall back to wall-clock differencing.
    """
    import shutil

    import numpy as np

    tmp = tempfile.mkdtemp(prefix="vpt_bench_profile_")
    try:
        jax.profiler.start_trace(tmp)
        try:
            run_steps()
        finally:
            jax.profiler.stop_trace()
        dumps = sorted(
            glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
        )
        if not dumps:
            return None
        module_ns, _, _ = parse_xplane_device_spans(dumps[-1])
        if len(module_ns) < min_events:
            return None
        return float(np.median(module_ns)) / 1e6
    except Exception:
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
