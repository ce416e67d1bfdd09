#!/usr/bin/env python
"""Multi-stream serving throughput: K independent videos per chip.

MultiStreamTracker batches K search-window ViT forwards into one encoder
call per frame-batch — the batch axis is where the MXU saturates (a batch-1
196-token forward leaves it mostly idle). Reports aggregate and per-stream
fps vs K; appends docs/bench_multistream.jsonl.

Usage: python tools/bench_multistream.py [--ks 1 2 4 8] [--frames 8]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--frames", type=int, default=8, help="staged rotation")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.runtime.banked import MultiStreamTracker

    cfg = Config.from_dict(
        {
            "model": {"variant": "vit-b16", "dtype": "bfloat16"},
            "filter": {"num_particles": 1024},
            "tracker": {"mode": "dense"},
        }
    )
    t_rot = args.frames
    rows = []
    for k in args.ks:
        srcs = [
            open_source("synthetic:moving-square", t_rot + 1, (480, 640), seed=s)
            for s in range(k)
        ]
        clips = np.stack([np.stack(list(s)) for s in srcs], axis=1)  # [T+1,K,...]
        ms = MultiStreamTracker(cfg, num_streams=k)
        ms.init(clips[0], np.stack([s.init_bbox for s in srcs]))
        batch = jax.device_put(jnp.asarray(clips[1:]))  # [T, K, H, W, 3]
        outs = ms.track_clips_device(batch)  # warm/compile
        np.asarray(outs.position)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            outs = ms.track_clips_device(batch)
            np.asarray(outs.position)
        dt = time.perf_counter() - t0
        agg = args.reps * t_rot * k / dt
        per = agg / k
        rows.append({"k": k, "model": cfg.model.variant,
                     "particles": cfg.filter.num_particles,
                     "fps_aggregate": round(agg, 1),
                     "fps_per_stream": round(per, 1)})
        print(f"K={k:3d}: {agg:8.1f} fps aggregate ({per:7.1f} per stream)",
              file=sys.stderr, flush=True)

    # Merge by (config, K) — last wins — so partial runs (--ks 32 64)
    # extend the curve instead of truncating it, and rows measured under a
    # DIFFERENT model/particle config can never splice into this curve and
    # render as one dataset (old rows without config fields are dropped).
    key = lambda r: (r.get("model"), r.get("particles"), r["k"])
    path = os.path.join(REPO, "docs", "bench_multistream.jsonl")
    old = {}
    if os.path.exists(path):
        with open(path) as f:
            for ln in f:
                if ln.strip():
                    r = json.loads(ln)
                    if "model" in r and "particles" in r:
                        old[key(r)] = r
    for r in rows:
        old[key(r)] = r
    merged = [old[k] for k in sorted(old, key=lambda t: (str(t[0]), t[1] or 0, t[2]))]
    with open(path, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")
    print(json.dumps(merged))
    return 0


if __name__ == "__main__":
    sys.exit(main())
