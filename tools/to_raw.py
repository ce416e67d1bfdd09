#!/usr/bin/env python
"""Convert any video / image glob / synthetic clip to packed RGB24 raw.

The native streaming reader (native/vpt_io.cpp, `io.source: path.rgb24`)
mmaps this layout directly: T x H x W x 3 uint8, no header. Frame geometry
travels in the config (io.frame_size), matching how raw video is handled in
production ingest pipelines.

Usage:
  python tools/to_raw.py synthetic:moving-square out.rgb24 --frames 120 --size 480 640
  python tools/to_raw.py clip.mp4 out.rgb24
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vitparticlefiltertracker_tpu.io.video import open_source


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("output")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--size", type=int, nargs=2, default=[480, 640],
                    metavar=("H", "W"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    src = open_source(args.source, args.frames, tuple(args.size), seed=args.seed)
    n = 0
    shape = None
    with open(args.output, "wb") as f:
        for frame in src:
            if shape is None:
                shape = frame.shape
            assert frame.shape == shape, "all frames must share one geometry"
            f.write(np.ascontiguousarray(frame, np.uint8).tobytes())
            n += 1
    h, w = shape[:2]
    print(f"wrote {n} frames ({h}x{w}) to {args.output}; "
          f"config: io.source: {args.output}, io.frame_size: [{h}, {w}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
