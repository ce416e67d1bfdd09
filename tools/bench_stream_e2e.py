#!/usr/bin/env python
"""ONE measured fused decode->track pipeline run (round-1 VERDICT missing #2).

Runs the actual `stream` path — native C++ ring source -> FramePump ->
async device_put -> jitted step -> trailing readback — as one live pipeline
and records the sustained fps plus the in-run stage breakdown from
runtime/streaming.py (ingest wait / submit / readback / drain). Nothing is
stitched from separate measurements.

Context for reading the numbers on THIS rig: the TPU sits behind a network
relay, so per-frame H2D is relay-bound (measured and reported below as
h2d_MBps), not PCIe-bound as on a co-located host. The pipeline itself and
each stage's sustained in-pipeline rate are what this benchmark proves;
docs/BENCH_RESULTS.md carries both the measured end-to-end number and the
decomposition.

Usage: python tools/bench_stream_e2e.py [--variant eval5|1080p|480p ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# BASELINE eval 5 is ViT-L/16k particles/4K; smaller variants show the
# pipeline at rates the relay can sustain for longer runs. "-roi" variants
# run the ROI-only H2D path (runtime/streaming.py RoiShipper, configured as
# in configs/eval5-tpu-streaming-4k.yaml): per-frame traffic drops from the
# full frame to roi² + glob/glob_every bytes.
EVAL5_TRACKER = {  # matches configs/eval5-tpu-streaming-4k.yaml
    "mode": "dense", "appearance": "pooled",
    "redetect_global_after": 10, "redetect_global_grid": 5,
    "redetect_accept_z": 3.0,
}
VARIANTS = {
    "eval5": {"model": "vit-l16", "particles": 16384, "frame": (2160, 3840), "frames": 8},
    # The synthetic target scales with resolution (~308px box at 4K ->
    # ~1230px search window), so the ROI is 1536px at stride 4 — the window
    # resamples at ~5.5px spacing, so stride 4 is lossless in practice.
    "eval5-roi": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        # Resampled-view ROI (vpt_read_view): 1400px span shipped as a 256²
        # bilinear view (stride 5.47 ~= the 1232px search window's own 224-
        # grid sample spacing, so fidelity matches the strided-5 slice at
        # 2/3 the bytes).
        "frames": 240, "roi": {"px": 1600, "out": 288, "glob_stride": 8, "glob_every": 8},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    # -c4 variants: 4 frames per H2D+dispatch (stream_track chunk=4) — the
    # per-dispatch relay cost (~11 ms host time, what capped -roi at 44 fps)
    # amortizes 4x; steering stays per-chunk (ROI prediction covers the gap).
    "eval5-roi-c4": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        "frames": 240, "chunk": 4,
        "roi": {"px": 1600, "out": 288, "glob_stride": 8, "glob_every": 8},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    # c8: steering granularity widens to 8 frames — dead reckoning still
    # covers it at this clip's velocities (ROI span has ~370px of slack;
    # the un-modeled sine acceleration drifts ~0.09*L² px over L lag
    # frames, so lag 48 stays ~200px inside it). 3 steer workers: steering
    # sustains ~workers*chunk/RTT fps, and at 60 fps with a 200 ms bad-
    # window RTT two workers would bind before the dispatch path does.
    "eval5-roi-c8": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        "frames": 240, "chunk": 8, "steer_lag": 48, "steer_workers": 3,
        "roi": {"px": 1600, "out": 288, "glob_stride": 8, "glob_every": 8},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    # ADAPTIVE chunk (runtime.stream_chunk_max): starts at c4 (the fps
    # median winner) and doubles to c8 whenever the rolling rate drops
    # below 60 fps — the worst-run insurance for the H2D congestion that
    # put one round-4 run at 56.7 fps (round-4 VERDICT weak #3). Both
    # sizes' executables are warmed before the measured window. steer_lag
    # 48 covers the c8 steering granularity when congestion forces it.
    "eval5-roi-adaptive": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        "frames": 240, "chunk": 4, "chunk_max": 8,
        "steer_lag": 48, "steer_workers": 3,
        "roi": {"px": 1600, "out": 288, "glob_stride": 8, "glob_every": 8},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    # 4K streaming soak (round-3 VERDICT missing #3): 1,000 frames through
    # the exact eval5-roi-c4 pipeline — sustained fps + RMSE + lost count
    # over a run ~4x the headline's, so one congested relay window can't
    # masquerade as the steady state.
    "eval5-roi-c4-soak1k": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        "frames": 1000, "chunk": 4,
        "roi": {"px": 1600, "out": 288, "glob_stride": 8, "glob_every": 8},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    # RMSE lever (round-3 VERDICT weak #6): dense-mode localization noise
    # scales with the window's 224-grid sample spacing — search_scale 4.0
    # puts the 4K window at 1232px (5.5 px/sample) vs 616px (2.75) at
    # 1080p, the measured 7.6-vs-4.0 RMSE ratio. With ROI steering + global
    # re-detection already bounding prediction error, the window does not
    # need 4x the box: 2.5x samples at 3.4 px and the ROI span shrinks
    # (1200px as a 352² view keeps the view stride at the window's own
    # sample spacing, so the resample stays lossless).
    "eval5-roi-c4-ss25": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        "frames": 240, "chunk": 4,
        "roi": {"px": 1200, "out": 352, "glob_stride": 8, "glob_every": 8},
        "tracker": {**EVAL5_TRACKER, "search_scale": 2.5},
        "lost_ratio": 0.55,
    },
    # ROI-escape recovery measured AT 4K (round-3 VERDICT missing #4): the
    # teleport clip re-enters in a different quadrant — far outside the
    # shipped ROI — so recovery MUST ride the decimated global view's
    # re-detection. Python procedural source (the native ring is moving-
    # square only), so fps here is decode-bound; the row's metric is
    # recover_err_px (mean error once the target is back + settled).
    "eval5-roi-teleport-c4": {
        "model": "vit-l16", "particles": 16384, "frame": (2160, 3840),
        "frames": 120, "chunk": 4, "clip": "teleport",
        "roi": {"px": 1600, "stride": 4, "glob_stride": 8, "glob_every": 4},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    "1080p": {"model": "vit-l16", "particles": 16384, "frame": (1080, 1920), "frames": 16},
    "1080p-roi": {
        "model": "vit-l16", "particles": 16384, "frame": (1080, 1920),
        # 768px span as a 280² view (stride 2.74 ~= the 616px window's own
        # sample spacing): 0.24 MB/frame instead of the 0.44 MB strided crop.
        "frames": 240, "roi": {"px": 768, "out": 280, "glob_stride": 4, "glob_every": 8},
        "tracker": EVAL5_TRACKER, "lost_ratio": 0.55,
    },
    "720p": {"model": "vit-b16", "particles": 1024, "frame": (720, 1280), "frames": 24},
    "480p": {"model": "vit-b16", "particles": 1024, "frame": (480, 640), "frames": 48},
}


def measure_h2d(shape) -> float:
    """Measured host->device bandwidth for one frame-sized buffer (MB/s)."""
    import jax

    buf = np.zeros(shape, np.uint8)
    dev = jax.device_put(buf)
    jax.block_until_ready(dev)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        _ = np.asarray(dev[0, 0, 0])  # force the transfer to complete
        times.append(time.perf_counter() - t0)
    mb = buf.nbytes / 1e6
    return mb / float(np.median(times))


def run_variant(name: str) -> dict:
    import jax

    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.runtime.streaming import stream_track
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

    v = VARIANTS[name]
    h, w = v["frame"]
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config.from_dict(
        {
            "model": {
                "variant": v["model"],
                "dtype": "bfloat16" if on_tpu else "float32",
                "use_flash_attention": on_tpu,
            },
            "filter": {
                "num_particles": v["particles"],
                "lost_conf_ratio": v.get("lost_ratio", 0.0),
            },
            "tracker": v.get("tracker", {"mode": "dense"}),
            "io": {"frame_size": [h, w]},
        }
    )
    # Native C++ prefetch-ring source (io/native.py); Python fallback keeps
    # the benchmark runnable when the toolchain is absent.
    from vitparticlefiltertracker_tpu.io import native as native_io

    n_frames = v["frames"] + 1
    clip = v.get("clip")  # non-default family -> python procedural source
    if clip is not None:
        src = open_source(f"synthetic:{clip}", n_frames, (h, w))
        source_kind = f"python-synthetic ({clip})"
    elif native_io.available():
        src = native_io.NativeSyntheticSource(n_frames, h, w, seed=0)
        source_kind = "native-synthetic (C++ ring)"
    else:
        if v.get("roi", {}).get("out"):
            # Resampled-view ROI needs the native reader (vpt_read_view);
            # the python fallback has no read_rect/read_view and would
            # crash in warmup. Skip with a note instead.
            print(
                f"skip {name}: roi_out requires the native ingest library "
                "(build native/ first)",
                file=sys.stderr,
            )
            return {}
        src = open_source("synthetic:moving-square", n_frames, (h, w))
        source_kind = "python-synthetic (fallback)"

    from vitparticlefiltertracker_tpu.runtime.streaming import RoiShipper

    roi = v.get("roi")
    tracker = Tracker(cfg)
    # Warm the step executable on a staged frame so compile time doesn't
    # pollute the pipeline measurement (the pipeline run is separate below).
    warm = np.zeros((h, w, 3), np.uint8)
    tracker.init(warm, np.asarray(src.init_bbox))
    if roi:
        # Warm the ROI-shaped executable (its own compile: different input
        # structure) with a throwaway shipper; stream_track re-inits below.
        ship = RoiShipper((h, w), roi["px"], (w / 2, h / 2),
                          roi_stride=roi.get("stride", 1),
                          glob_stride=roi["glob_stride"],
                          glob_every=roi["glob_every"],
                          roi_out=roi.get("out", 0))
        warm_dev = (
            ship.ship_native(src, 0) if roi.get("out") else ship.ship(warm)
        )
        shipped_mb = ship.shipped_bytes_per_frame / 1e6
    else:
        warm_dev = jax.device_put(warm)
        shipped_mb = h * w * 3 / 1e6
    chunk = int(v.get("chunk", 1))
    chunk_max = int(v.get("chunk_max", 0))
    if chunk > 1:
        # Warm the CHUNK executable (C-frame scan: its own compile) — and
        # with adaptive sizing, EVERY size the stream may switch to, so a
        # mid-run switch never pays a compile inside the measured window.
        # Python sources (non-default clips) have no read_rect: warm via
        # the host-crop chunk shipper on zero frames instead.
        warm_sizes = [chunk]
        while chunk_max and warm_sizes[-1] * 2 <= chunk_max:
            warm_sizes.append(warm_sizes[-1] * 2)

        def warm_chunk(c):
            if hasattr(src, "read_rect"):
                return ship.ship_native_chunk(src, [0] * c)
            return ship.ship_chunk([warm] * c, list(range(c)))

        for c in warm_sizes:
            out = tracker.step_chunk_device(warm_chunk(c))
            np.asarray(out.position)
            # Warm the fused step+pack executable the records pipeline runs
            # (stream_track switches to it after the first chunk).
            np.asarray(tracker.step_chunk_packed(warm_chunk(c)))
        t_dev0 = time.perf_counter()
        out = tracker.step_chunk_device(warm_chunk(chunk))
        np.asarray(out.position)
        step_rtt_ms = (time.perf_counter() - t_dev0) * 1e3 / chunk
    else:
        out = tracker.step_device(warm_dev)
        np.asarray(out.position)
        if roi:  # records path live -> warm the fused step+pack executable
            np.asarray(tracker.step_packed(warm_dev))
        t_dev0 = time.perf_counter()
        out = tracker.step_device(warm_dev)
        np.asarray(out.position)
        step_rtt_ms = (time.perf_counter() - t_dev0) * 1e3

    recs: list[dict] = []
    stats = stream_track(
        tracker, src, np.asarray(src.init_bbox),
        on_record=recs.append if roi else None,
        readback_window=32 if roi else 4,
        pump_depth=4,
        roi_px=roi["px"] if roi else 0,
        roi_stride=roi.get("stride", 1) if roi else 1,
        glob_stride=roi["glob_stride"] if roi else 8,
        glob_every=roi["glob_every"] if roi else 4,
        roi_out=roi.get("out", 0) if roi else 0,
        steer_lag=v.get("steer_lag", 32),
        chunk=chunk,
        steer_workers=v.get("steer_workers", 2),
        chunk_max=chunk_max,
    )
    row = {
        "variant": name,
        "model": v["model"],
        "particles": v["particles"],
        "frame": [h, w],
        "source": source_kind,
        "measured_end_to_end": True,
        "fps": round(stats["fps"], 2),
        "frames": stats["frames"],
        "wall_s": round(stats["wall_s"], 2),
        "ingest_wait_s": stats["ingest_wait_s"],
        "submit_s": stats["submit_s"],
        "readback_s": stats["readback_s"],
        "drain_s": stats["drain_s"],
        "warm_step_plus_rtt_ms": round(step_rtt_ms, 1),
        "h2d_MBps": round(measure_h2d((h, w, 3)), 1),
        "frame_MB": round(h * w * 3 / 1e6, 1),
        "shipped_MB_per_frame": round(shipped_mb, 3),
        "chunk": chunk,
        **({"chunk_max": chunk_max} if chunk_max else {}),
        "backend": jax.default_backend(),
    }
    if roi and recs and getattr(src, "truth", None) is not None:
        truth = np.asarray(src.truth)
        pairs = [
            (r["frame"],
             float(np.hypot(r["position"][0] - truth[r["frame"]][0],
                            r["position"][1] - truth[r["frame"]][1])))
            for r in recs if r["frame"] < len(truth)
        ]
        errs = [e for _, e in pairs]
        row["track_rmse_px"] = round(float(np.sqrt(np.mean(np.square(errs)))), 1)
        row["track_lost_frames"] = int(sum(bool(np.any(r["lost"])) for r in recs))
        if clip == "teleport":
            # Recovery metric: error once the target has been visible again
            # for 10 frames (whole-trajectory RMSE is dominated by the
            # hidden span, where no tracker can score).
            from vitparticlefiltertracker_tpu.io.synthetic import teleport_times

            _, t_show = teleport_times(n_frames)
            late = [e for f, e in pairs if f >= t_show + 10]
            row["teleport_show_frame"] = int(t_show)
            row["recover_err_px"] = round(float(np.mean(late)), 1) if late else None
    print(json.dumps(row), flush=True)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["480p", "720p", "1080p", "eval5"],
                    choices=sorted(VARIANTS))
    args = ap.parse_args()
    enable_compilation_cache()
    rows = [r for r in (run_variant(v) for v in args.variants) if r]
    out = os.path.join(REPO, "docs", "bench_stream_e2e.jsonl")
    # Merge by variant so a partial re-run doesn't drop other rows.
    merged: dict[str, dict] = {}
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    merged[r["variant"]] = r
    # The relay's H2D bandwidth swings 2-3x with congestion, so one run is a
    # claim, not evidence: a variant repeated N>1 times in one invocation is
    # folded into ONE row carrying the median run's stage breakdown plus the
    # full fps distribution (fps_runs / fps_min / fps_max, and the per-run
    # RMSEs) so min-over-repeats stays documented.
    by_variant: dict[str, list[dict]] = {}
    for r in rows:
        by_variant.setdefault(r["variant"], []).append(r)
    for variant, runs in by_variant.items():
        if len(runs) == 1:
            merged[variant] = runs[0]
            continue
        ordered = sorted(runs, key=lambda r: r["fps"])
        rep = dict(ordered[len(ordered) // 2])  # median-fps run's breakdown
        rep["runs"] = len(runs)
        rep["fps_runs"] = [r["fps"] for r in runs]
        rep["fps_min"] = ordered[0]["fps"]
        rep["fps"] = rep["fps_median"] = ordered[len(ordered) // 2]["fps"]
        rep["fps_max"] = ordered[-1]["fps"]
        if any("track_rmse_px" in r for r in runs):
            rep["rmse_runs"] = [r.get("track_rmse_px") for r in runs]
        merged[variant] = rep
    with open(out, "w") as f:
        for key in sorted(merged):
            f.write(json.dumps(merged[key]) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
