"""Benchmark harness (component B14): fps/chip + p50/p99 step latency.

Reproduces the BASELINE.md eval configs. The measured unit is the full
per-frame tracker step (one jitted device call: propagate -> features ->
likelihood -> estimate -> resample) over device-resident frames — the same
unit BASELINE.json:2 targets (>=60 fps/chip at ViT-B/16 + 1k particles,
p50 < 16 ms). Frames are pre-staged in HBM in ONE transfer so the number
isolates on-chip compute; the streaming pipeline (runtime/streaming.py)
covers H2D-overlapped serving.

Tunneled-TPU etiquette (this rig's chip sits behind a ~1 MB/s relay): stage
a small rotation of frames, avoid per-step host syncs in the throughput
loop, and print progress to stderr so a slow run is observable.
"""

from __future__ import annotations

import sys
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.io.video import open_source


def _log(msg: str, verbose: bool) -> None:
    if verbose:
        print(f"[bench +{time.perf_counter() - _log.t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def run_benchmark(
    cfg: Config,
    warmup: int = 5,
    measure_frames: int = 200,
    latency_frames: int = 16,
    stage_frames: int = 8,
    verbose: bool = True,
) -> dict[str, Any]:
    """Benchmark the tracker on the config's source. Returns a JSON-able dict."""
    _log.t0 = time.perf_counter()
    cfg.resolve()
    source = open_source(
        cfg.io.source,
        num_frames=max(stage_frames + 1, min(cfg.io.num_frames or 16, stage_frames + 1)),
        frame_size=tuple(cfg.io.frame_size),
        seed=cfg.filter.seed,
    )
    frames = np.stack(list(source))
    init_bbox = getattr(source, "init_bbox", None)
    if init_bbox is None:
        init_bbox = np.asarray(cfg.io.init_bbox, np.float32)
    _log(f"clip ready: {frames.shape}", verbose)

    if cfg.runtime.banks > 1:
        from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

        tracker = MultiTracker(cfg)
        bboxes = np.tile(init_bbox, (cfg.runtime.banks, 1))
        tracker.init(frames[0], bboxes)
    else:
        from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

        tracker = Tracker(cfg)
        tracker.init(frames[0], init_bbox)
    jax.block_until_ready(tracker.state)
    _log("tracker initialized (init compiled)", verbose)

    # Stage a small frame rotation in HBM in one transfer.
    dev_clip = jax.device_put(jnp.asarray(frames[1 : 1 + stage_frames]))
    dev_frames = [dev_clip[i] for i in range(dev_clip.shape[0])]
    jax.block_until_ready(dev_clip)
    n_rot = len(dev_frames)
    _log(f"{n_rot} frames staged in HBM", verbose)

    # Warmup (compile + cache).
    for i in range(warmup):
        out = tracker.step_device(dev_frames[i % n_rot])
    jax.block_until_ready(out)
    _log("step compiled + warm", verbose)

    # Latency: per-step sync (true per-frame latency distribution).
    lat_ms = []
    for i in range(latency_frames):
        f = dev_frames[i % n_rot]
        t0 = time.perf_counter()
        out = tracker.step_device(f)
        jax.block_until_ready(out)
        lat_ms.append((time.perf_counter() - t0) * 1e3)
    _log(f"latency sampled: p50={np.percentile(lat_ms, 50):.2f}ms", verbose)

    # Throughput: async pipeline, sync at the end (steady-state rate).
    t0 = time.perf_counter()
    for i in range(measure_frames):
        out = tracker.step_device(dev_frames[i % n_rot])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = measure_frames / dt
    _log(f"throughput: {fps:.1f} fps over {measure_frames} frames", verbose)

    lat = np.asarray(lat_ms)
    return {
        "config": {
            "model": cfg.model.variant,
            "image_size": cfg.model.image_size,
            "dtype": cfg.model.dtype,
            "mode": cfg.tracker.mode,
            "num_particles": cfg.filter.num_particles,
            "banks": cfg.runtime.banks,
            "frame_size": list(cfg.io.frame_size),
            "backend": jax.default_backend(),
        },
        "fps": fps,
        "p50_ms": float(np.percentile(lat, 50)),
        "p99_ms": float(np.percentile(lat, 99)),
        "mean_ms": float(lat.mean()),
        "frames_measured": int(measure_frames),
    }
