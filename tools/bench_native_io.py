#!/usr/bin/env python
"""Host-side ingest benchmark: native (C++) prefetch ring vs Python pump.

The host half of eval config 5 (streaming 4K decode->track): can the
producer sustain 60 fps at 4K (1.49 GB/s of RGB24)? Compares:

  * python-synthetic — io/synthetic.py generator through runtime/streaming.py's
    FramePump (GIL-bound)
  * native-synthetic — native/vpt_io.cpp procedural generator through the
    C++ prefetch ring (GIL-free pthread producer)
  * native-raw — mmap'ed RGB24 file through the C++ ring (the production
    ingest path; bounded by page-cache/disk bandwidth)

Usage: python tools/bench_native_io.py [--frames N] [--size H W]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label: str, it, n_expected: int) -> dict:
    t0 = time.perf_counter()
    n = 0
    checksum = 0
    for frame in it:
        n += 1
        checksum ^= int(frame[0, 0, 0])  # touch the data
    dt = time.perf_counter() - t0
    fps = n / dt if dt > 0 else float("inf")
    print(f"{label:18s} {n:5d} frames  {fps:8.1f} fps  ({dt:.2f}s)")
    assert n == n_expected, (n, n_expected)
    return {"label": label, "fps": fps, "frames": n}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--size", type=int, nargs=2, default=[2160, 3840],
                    metavar=("H", "W"))
    args = ap.parse_args()
    h, w = args.size
    n = args.frames

    from vitparticlefiltertracker_tpu.io import native
    from vitparticlefiltertracker_tpu.io.video import SyntheticSource
    from vitparticlefiltertracker_tpu.runtime.streaming import FramePump

    print(f"frame: {h}x{w}x3 = {h*w*3/1e6:.1f} MB; target 60 fps = "
          f"{h*w*3*60/1e9:.2f} GB/s\n")

    # Python generator through the Python pump. SyntheticSource generates
    # the whole clip in __init__, so construction is INSIDE the timing —
    # it's the producer work a real decoder would do per frame.
    t0 = time.perf_counter()
    src_py = SyntheticSource("moving-square", num_frames=n, height=h, width=w)
    pump = FramePump(iter(src_py), depth=3)
    r = timed("python-synthetic", pump, n)
    gen_dt = time.perf_counter() - t0
    print(f"{'':18s} incl. generation: {n/gen_dt:8.1f} fps")

    if not native.available():
        print("native library unavailable — skipping native paths")
        return 0

    timed("native-synthetic",
          native.NativeSyntheticSource(n, h, w, seed=0, depth=4), n)
    timed("native-synth-view",
          native.NativeSyntheticSource(n, h, w, seed=0, depth=4).iter_views(),
          n)

    # Raw mmap path: write a small clip, stream it repeatedly by length.
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clip.rgb24")
        gen = native.NativeSyntheticSource(min(n, 16), h, w, seed=0)
        with open(path, "wb") as f:
            for i in range(len(gen)):
                f.write(gen.read(i).tobytes())
        gen.close()
        m = min(n, 16)
        timed("native-raw(mmap)", native.NativeRawSource(path, h, w, depth=4), m)
        timed("native-raw-view",
              native.NativeRawSource(path, h, w, depth=4).iter_views(), m)
    return 0


if __name__ == "__main__":
    sys.exit(main())
