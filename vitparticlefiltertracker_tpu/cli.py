"""CLI entry point (component B2): `python main.py --config config.yaml`.

Matches the reference's invocation contract (/root/reference/README.md:37
"python main.py"; README.md:42 config.yaml-driven, real-time positions out).
Subcommands: track (default), bench, stream (fused decode->track pipeline),
serve (K videos batched on one chip), train (in-repo feature learning).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from vitparticlefiltertracker_tpu.config import Config, load_config


from vitparticlefiltertracker_tpu.utils.platform import (
    honor_jax_platforms_env as _honor_jax_platforms_env,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vpt", description="TPU-native ViT + particle-filter tracker"
    )
    p.add_argument(
        "command",
        nargs="?",
        default="track",
        choices=["track", "bench", "stream", "train", "serve"],
    )
    p.add_argument("--config", "-c", default="", help="path to config.yaml")
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY.PATH=VALUE",
        help="override config values, e.g. --set filter.num_particles=4096",
    )
    p.add_argument("--quiet", "-q", action="store_true", help="suppress stderr summary")
    return p


def load(args, implicit_config: bool = False) -> Config:
    if args.config:
        return load_config(args.config, args.overrides)
    # The reference's documented invocation is a BARE `python main.py`
    # configured by "the config.yaml file" (README.md:37,42) — so a real
    # command-line run (argv=None in main(); implicit_config=True) without
    # --config picks up ./config.yaml when present. Programmatic callers
    # passing an explicit argv keep the built-in defaults.
    if implicit_config and os.path.exists("config.yaml"):
        return load_config("config.yaml", args.overrides)
    cfg = Config()
    from vitparticlefiltertracker_tpu.config import apply_override

    for ov in args.overrides:
        apply_override(cfg, ov)
    return cfg.resolve()


def cmd_track(cfg: Config, quiet: bool = False) -> int:
    from vitparticlefiltertracker_tpu.io.sink import JsonlSink, OverlaySink
    from vitparticlefiltertracker_tpu.io.video import open_source

    source = open_source(
        cfg.io.source,
        num_frames=cfg.io.num_frames,
        frame_size=tuple(cfg.io.frame_size),
        seed=cfg.filter.seed,
    )
    sink = JsonlSink(cfg.io.output)
    overlay = OverlaySink(cfg.io.overlay) if cfg.io.overlay else None

    t_start = time.perf_counter()
    count = 0
    frames_iter = iter(source)
    resume = cfg.io.resume_state
    if resume and cfg.runtime.banks > 1:
        raise ValueError("io.resume_state supports a single tracker "
                         "(runtime.banks == 1)")
    if not resume:
        frame0 = next(frames_iter)
        bbox = getattr(source, "init_bbox", None)
        if bbox is None:
            bbox = cfg.io.init_bbox

    if cfg.runtime.banks > 1:
        from vitparticlefiltertracker_tpu.runtime.banked import (
            MultiTracker,
            banked_bboxes,
        )

        tracker = MultiTracker(cfg)
        tracker.init(frame0, banked_bboxes(bbox, cfg.runtime.banks))
        for i, frame in enumerate(frames_iter):
            recs = tracker.step(frame)
            for rec in recs:
                rec["frame"] = i + 1
                sink.write(rec)
            if overlay is not None:
                overlay.write_multi(frame, recs)
            count += 1
    else:
        from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

        tracker = Tracker(cfg)
        if resume:
            tracker.resume(resume)
            # Continue record numbering from the checkpointed frame
            # counter; every source frame is a step (no init frame).
            base = int(np.asarray(tracker.state.frame_idx))
        else:
            tracker.init(frame0, bbox)
            base = 0
        for i, frame in enumerate(frames_iter):
            rec = tracker.step(frame)
            rec["frame"] = base + i + 1
            sink.write(rec)
            if overlay is not None:
                overlay.write(frame, rec)
            count += 1
        if cfg.io.save_state:
            tracker.save(cfg.io.save_state)
            if not quiet:
                print(f"saved state to {cfg.io.save_state}", file=sys.stderr)
    wall = time.perf_counter() - t_start
    sink.close()
    if overlay is not None:
        overlay.close()
    if not quiet and count:
        print(
            f"tracked {count} frames in {wall:.2f}s ({count / wall:.1f} fps)",
            file=sys.stderr,
        )
    return 0


def cmd_bench(cfg: Config, quiet: bool = False) -> int:
    from vitparticlefiltertracker_tpu.runtime.benchmark import run_benchmark

    result = run_benchmark(cfg)
    import json

    print(json.dumps(result))
    return 0


def cmd_stream(cfg: Config, quiet: bool = False) -> int:
    """Fused decode->track pipeline (B12): producer thread + async H2D."""
    from vitparticlefiltertracker_tpu.io.sink import JsonlSink
    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.runtime.streaming import stream_track

    source = open_source(
        cfg.io.source,
        num_frames=cfg.io.num_frames,
        frame_size=tuple(cfg.io.frame_size),
        seed=cfg.filter.seed,
    )
    init_bbox = getattr(source, "init_bbox", None)
    if init_bbox is None:
        init_bbox = cfg.io.init_bbox
    if cfg.runtime.banks > 1:
        from vitparticlefiltertracker_tpu.runtime.banked import (
            MultiTracker,
            banked_bboxes,
        )

        tracker = MultiTracker(cfg)
        init_bbox = banked_bboxes(init_bbox, cfg.runtime.banks)
    else:
        from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

        tracker = Tracker(cfg)
    sink = JsonlSink(cfg.io.output)
    rt = cfg.runtime
    stats = stream_track(
        tracker, source, init_bbox, on_record=sink.write,
        pump_depth=rt.prefetch_frames,
        readback_window=rt.stream_readback,
        roi_px=rt.stream_roi if rt.banks == 1 else 0,
        roi_stride=rt.stream_roi_stride,
        roi_out=rt.stream_roi_out,
        steer_lag=rt.stream_steer_lag,
        glob_stride=rt.stream_glob_stride,
        glob_every=rt.stream_glob_every,
        chunk=rt.stream_chunk if rt.banks == 1 and rt.stream_roi > 0 else 1,
        steer_workers=rt.stream_steer_workers,
        chunk_max=rt.stream_chunk_max,
        fps_target=rt.stream_fps_target,
        lost_throttle=rt.stream_lost_throttle,
    )
    sink.close()
    if not quiet:
        print(
            f"streamed {stats['frames']} frames in {stats['wall_s']:.2f}s "
            f"({stats['fps']:.1f} fps)",
            file=sys.stderr,
        )
    return 0


def cmd_serve(cfg: Config, quiet: bool = False) -> int:
    """Multi-stream serving: K independent videos batched on one chip.

    One MultiStreamTracker step per frame-batch — the K search-window ViT
    forwards fuse into one encoder call, which is where the MXU saturates
    (batch-1 leaves it mostly idle; K=16 measured 1088 fps aggregate on one
    v5e). Sources: io.source as a comma-separated list, or one spec
    replicated runtime.streams times with per-stream seeds. Records carry a
    "stream" field; readback trails by a small window so the device
    pipeline never drains (same discipline as `stream`).
    """
    from vitparticlefiltertracker_tpu.io.sink import JsonlSink
    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.runtime.banked import MultiStreamTracker
    from vitparticlefiltertracker_tpu.runtime.streaming import FramePump, stream_track

    specs = [s.strip() for s in cfg.io.source.split(",") if s.strip()]
    if len(specs) == 1:
        specs = specs * cfg.runtime.streams
    k = len(specs)
    sources = [
        open_source(
            spec,
            num_frames=cfg.io.num_frames,
            frame_size=tuple(cfg.io.frame_size),
            seed=cfg.filter.seed + i,
        )
        for i, spec in enumerate(specs)
    ]
    pumps = [
        iter(FramePump(s, depth=cfg.runtime.prefetch_frames)) for s in sources
    ]
    bboxes = np.stack(
        [
            np.asarray(
                getattr(s, "init_bbox", None)
                if getattr(s, "init_bbox", None) is not None
                else cfg.io.init_bbox,
                np.float32,
            )
            for s in sources
        ]
    )

    def lockstep():
        """Stack the K pumps into one [K, H, W, 3] frame stream; stop at
        the shortest stream. The whole serve pipeline then rides
        stream_track's trailing-readback discipline — ONE implementation
        of the submit/window/drain logic, not a serve-local copy."""
        while True:
            frames = [next(p, None) for p in pumps]
            if any(f is None for f in frames):
                return
            shapes = {f.shape for f in frames}
            if len(shapes) > 1:
                raise ValueError(
                    f"serve needs equal frame sizes across streams, got {shapes}"
                )
            yield np.stack(frames)

    ms = MultiStreamTracker(cfg, num_streams=k)
    sink = JsonlSink(cfg.io.output)

    def on_record(rec):
        # stream_track emits one record per frame-batch with K-vector
        # fields; fan it out into one record per stream.
        for s in range(k):
            sink.write(
                {
                    "stream": s,
                    "frame": rec["frame"],
                    "position": rec["position"][s],
                    "box": rec["box"][s],
                    "conf": rec["conf"][s],
                    "ess": rec["ess"][s],
                    "lost": rec["lost"][s],
                }
            )

    stats = stream_track(ms, lockstep(), bboxes, on_record=on_record)
    sink.close()
    if not quiet and stats["frames"]:
        print(
            f"served {k} streams x {stats['frames']} frames in "
            f"{stats['wall_s']:.2f}s ({k * stats['fps']:.1f} fps aggregate, "
            f"{stats['fps']:.1f} per stream)",
            file=sys.stderr,
        )
    return 0


def cmd_train(cfg: Config, quiet: bool = False) -> int:
    """Train ViT appearance features in-repo (training/, config `train:`)."""
    from vitparticlefiltertracker_tpu.training.train import train_features

    train_features(cfg, log=(lambda s: None) if quiet else None)
    return 0


def main(argv=None) -> int:
    from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

    _honor_jax_platforms_env()
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    cfg = load(args, implicit_config=argv is None)
    if args.command == "bench":
        return cmd_bench(cfg, args.quiet)
    if args.command == "stream":
        return cmd_stream(cfg, args.quiet)
    if args.command == "train":
        return cmd_train(cfg, args.quiet)
    if args.command == "serve":
        return cmd_serve(cfg, args.quiet)
    return cmd_track(cfg, args.quiet)


if __name__ == "__main__":
    sys.exit(main())
