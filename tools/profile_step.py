#!/usr/bin/env python
"""Hardware-counter evidence for the on-device step latency (B14/§5.1).

The bench's `p50_device_ms` is the XPlane-measured per-step device span
(runtime/benchmark.py, via utils/profiling.profiled_step_device_ms). This
tool is the standalone report with an op-level breakdown: it traces the
jitted tracker step with jax.profiler, parses the XPlane dump in-process
(jax.profiler.ProfileData), and reports device-plane busy time per step
plus the top ops. docs/PROFILE.md is regenerated from the measurement.

Usage: python tools/profile_step.py [--config configs/eval2-tpu-occlusion.yaml]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/eval2-tpu-occlusion.yaml")
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    import jax

    from vitparticlefiltertracker_tpu.config import load_config
    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker
    from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(os.path.join(REPO, args.config))
    src = open_source(
        cfg.io.source, max(8, min(16, args.steps)), tuple(cfg.io.frame_size)
    )
    frames = [jax.device_put(f) for f in src]
    # Honor runtime.banks: profiling eval4 with a single-bank Tracker while
    # the bench runs the 8-bank MultiTracker published two contradictory
    # "eval4 device step" numbers differing by exactly the bank count
    # (0.67 vs 5.30 ms, round-4 ADVICE). One step below = one full config
    # step, same unit as run_benchmark's p50_device_ms.
    if cfg.runtime.banks > 1:
        from vitparticlefiltertracker_tpu.runtime.banked import (
            MultiTracker,
            banked_bboxes,
        )

        tr = MultiTracker(cfg)
        tr.init(
            np.asarray(jax.device_get(frames[0])),
            banked_bboxes(np.asarray(src.init_bbox, np.float32),
                          cfg.runtime.banks),
        )
    else:
        tr = Tracker(cfg)
        tr.init(np.asarray(jax.device_get(frames[0])), src.init_bbox)

    # Warm up (compile) outside the trace.
    for f in frames[1:3]:
        out = tr.step_device(f)
    np.asarray(out.position)

    tmp = tempfile.mkdtemp(prefix="vpt_profile_")
    jax.profiler.start_trace(tmp)
    n = 0
    for i in range(args.steps):
        out = tr.step_device(frames[2 + (i % (len(frames) - 3))])
        n += 1
    np.asarray(out.position)  # drain before stopping the trace
    jax.profiler.stop_trace()

    xplane = sorted(glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True))
    if not xplane:
        print(f"no xplane dump found under {tmp}", file=sys.stderr)
        return 1

    # Shared parser (utils/profiling.py): "XLA Modules" = one event per
    # executed module (= per tracker step), the authoritative device span;
    # "Async XLA Ops" (DMA prefetch under scan-over-layers) overlaps
    # compute and is excluded from the op breakdown.
    from vitparticlefiltertracker_tpu.utils.profiling import (
        parse_xplane_device_spans,
    )

    module_ns, per_op, planes = parse_xplane_device_spans(xplane[-1])
    ops_total_ns = sum(per_op.values())
    if not module_ns:
        print("no XLA Modules line found in device planes", file=sys.stderr)
        return 1
    per_step_ms = float(np.median(module_ns)) / 1e6
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:12]

    import json

    runs_path = os.path.join(REPO, "docs", "profile_runs.jsonl")
    rows = []
    if os.path.exists(runs_path):
        with open(runs_path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    row = {
        "config": args.config,
        "steps": n,
        "planes": planes,
        "per_step_ms": round(per_step_ms, 2),
        "top_ops": [
            {"op": name, "ms": round(ns / 1e6, 2),
             "share": round(ns / ops_total_ns, 3)}
            for name, ns in top
        ],
    }
    rows = [r for r in rows if r["config"] != args.config] + [row]
    with open(runs_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    md = os.path.join(REPO, "docs", "PROFILE.md")
    with open(md, "w") as f:
        f.write(
            "# Profiler evidence: on-device step time\n\n"
            "**FULLY GENERATED** by `python tools/profile_step.py --config "
            "<cfg>` — do not hand-edit; hardware run records that must "
            "survive regeneration live in `docs/HARDWARE_RUNS.md`. Jitted "
            "tracker steps are traced with jax.profiler; the XPlane dump "
            "is parsed in-process (jax.profiler.ProfileData) and the "
            "per-step device execution span is read off the TPU plane's "
            "'XLA Modules' line (one event per executed module). The "
            "bench's `p50_device_ms` (runtime/benchmark.py) is measured "
            "the same way in-process and in the SAME unit — one full "
            "config step, ALL banks included (the profiler builds the "
            "banked tracker when `runtime.banks > 1`) — so each config's "
            "`per_step_ms` here must agree with `p50_device_ms` in "
            "docs/bench_evals_tpu.jsonl up to run-to-run noise; this "
            "standalone report adds the op breakdown. Async-DMA lines "
            "(weight prefetch under the scan-over-layers) overlap compute "
            "and are excluded from op shares.\n\n"
        )
        for r in rows:
            f.write(
                f"## `{r['config']}`\n\n"
                f"- steps traced: {r['steps']} on {r['planes']}\n"
                f"- median device execution span per step: "
                f"**{r['per_step_ms']:.2f} ms**\n\n"
                "| op group | total ms | share of op time |\n|---|---|---|\n"
            )
            for t in r["top_ops"]:
                f.write(
                    f"| `{t['op'][:60]}` | {t['ms']:.2f} "
                    f"| {100 * t['share']:.1f}% |\n"
                )
            f.write("\n")
    print(f"wrote {md}; device busy/step = {per_step_ms:.2f} ms over {n} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
