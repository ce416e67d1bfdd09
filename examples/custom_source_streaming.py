#!/usr/bin/env python
"""Integrate the streaming pipeline with YOUR frame producer and consumer.

stream_track (component B12) accepts any iterable of [H, W, 3] uint8 frames
— a camera loop, a decoder, a robot's perception bus — and delivers records
to a callback with a small bounded latency while the device pipeline stays
full (async H2D, trailing packed readback, optional ROI-only shipping and
chunked dispatch; see docs/DESIGN.md §7).

Run: JAX_PLATFORMS=cpu python examples/custom_source_streaming.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

import numpy as np

from vitparticlefiltertracker_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # some TPU plugins override JAX_PLATFORMS; re-apply it

from vitparticlefiltertracker_tpu import Config, Tracker, stream_track

H, W = 240, 320
BOX = 28.0


def my_frame_producer(n=40):
    """Stand-in for your decoder/camera: target on a known diagonal."""
    rng = np.random.default_rng(0)
    bg = rng.integers(0, 60, size=(H, W, 3), dtype=np.uint8)
    for t in range(n):
        f = bg.copy()
        x, y = 60 + 3 * t, 60 + 2 * t
        f[int(y - BOX / 2) : int(y + BOX / 2), int(x - BOX / 2) : int(x + BOX / 2)] = (
            230,
            180,
            40,
        )
        yield f


cfg = Config.from_dict(
    {
        "model": {
            "variant": "vit-t16",
            "image_size": 128,
            "dtype": "float32",
            "use_flash_attention": False,
        },
        "filter": {"num_particles": 256},
        "tracker": {"mode": "dense"},
    }
)

records = []
stats = stream_track(
    Tracker(cfg),
    my_frame_producer(),
    init_bbox=[60 - BOX / 2, 60 - BOX / 2, BOX, BOX],
    on_record=records.append,  # your consumer: UI overlay, controller, bus
    # ROI-only H2D + chunked dispatch: the levers that make 4K real-time
    # (ship a predicted crop instead of the frame; track 4 frames/dispatch).
    roi_px=160,
    glob_stride=4,
    chunk=4,
    steer_lag=8,
    readback_window=8,
)

last = max(records, key=lambda r: r["frame"])
print(
    f"{stats['frames']} frames at {stats['fps']:.1f} fps; "
    f"last position ({last['position'][0]:.1f}, {last['position'][1]:.1f}), "
    f"truth ({60 + 3 * stats['frames']:.0f}, {60 + 2 * stats['frames']:.0f})"
)
