#!/usr/bin/env python
"""Minimal programmatic use of the tracker (reference README.md:10
"Modular Design: Easy to extend and integrate with other projects").

Builds a Tracker from a Config, feeds it frames one by one, and reads the
per-frame position records — the same loop `python main.py track` runs.
CPU-runnable in a few seconds; on a TPU drop the JAX_PLATFORMS=cpu and the
float32/flash overrides to get the bf16 + flash-attention fast path.

Run: JAX_PLATFORMS=cpu python examples/minimal_track.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

import numpy as np

from vitparticlefiltertracker_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # some TPU plugins override JAX_PLATFORMS; re-apply it

from vitparticlefiltertracker_tpu import Config, Tracker, open_source

cfg = Config.from_dict(
    {
        # vit-t16/float32 keeps this demo CPU-fast; use the defaults
        # (vit-b16, bfloat16, flash attention) on a TPU.
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

# Any frame source works: an iterable of [H, W, 3] uint8 numpy arrays.
# open_source handles video files, image globs, camera:<n>, synthetic:*.
src = open_source("synthetic:moving-square", num_frames=16, frame_size=(240, 320))
frames = iter(src)

tracker = Tracker(cfg)
tracker.init(next(frames), src.init_bbox)  # bbox: (x, y, w, h) in pixels

for frame in frames:
    rec = tracker.step(frame)  # one jitted device step + one tiny readback
    print(
        f"frame {int(np.asarray(tracker.state.frame_idx))}: "
        f"pos=({rec['position'][0]:.1f}, {rec['position'][1]:.1f}) "
        f"conf={rec['conf']:.2f} lost={rec['lost']}"
    )

# Mid-stream checkpoint/resume: tracker.save(path) / tracker.resume(path)
# continues the exact trajectory (bitwise — counter-based RNG).
