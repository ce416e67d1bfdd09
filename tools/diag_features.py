#!/usr/bin/env python
"""Feature-quality diagnostic: WHY does a weight set track well or badly?

Tracking RMSE (tools/eval_quality.py) is the end metric, but it confounds
the filter with the features. This tool isolates the features: for a weight
set and clip, it measures the cosine-to-template as a function of spatial
offset from the TRUE target position — the likelihood profile the particle
filter actually consumes (z-normed, so only the SHAPE matters).

Per (weights, clip) it reports, averaged over probe frames:
  peak_drop_2/4/8   cos(truth) - mean cos at 2/4/8 px offset: localization
                    sharpness at particle-cloud scale (sigma_pos ~= 3 px).
  cloud_snr         peak_drop_3 / std(cos over a sigma=3px Gaussian cloud):
                    how many "likelihood sigmas" a 3 px error costs. THE
                    number that predicts posterior concentration.
  bg_sep            (cos(truth) - mean bg cos) / std bg cos at 0.5-1.5 box
                    offsets: re-detection / distractor margin.
  tmpl_decay        cos(truth, frame-0 template) at the last probe frame:
                    appearance invariance across the clip's nuisance
                    (rotation/photometric decay this for weak features).

Usage:
  python tools/diag_features.py                      # random init
  python tools/diag_features.py --checkpoint checkpoints/vit_b16_tracking.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.models.embedder import (
    DenseEmbedSpec,
    make_dense_embedder,
)
from vitparticlefiltertracker_tpu.ops.likelihood import l2_normalize
from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def build(checkpoint: str):
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config.from_dict(
        {
            "model": {
                "variant": "vit-b16",
                "image_size": 224,
                "dtype": "bfloat16" if on_tpu else "float32",
                "use_flash_attention": False,
                "checkpoint": checkpoint,
            },
            "tracker": {"mode": "dense"},
        }
    ).resolve()
    from vitparticlefiltertracker_tpu.models.params import resolve_vit_params

    es = DenseEmbedSpec.from_config(cfg)
    prm = jax.device_put(resolve_vit_params(cfg, None))
    return cfg, es, prm


def build_fns(es):
    """Jitted probe fns, built ONCE (clips share shapes -> one compile).
    Weights are explicit jit ARGUMENTS (never closure constants — baked
    constants bloat the HLO and overflow this rig's remote-compile relay;
    see runtime/tracker.py build_tracker_fns)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def template_of(prm, frame, ctr, side, wh):
        pool = make_dense_embedder(prm, frame, ctr, side, es)
        emb, _ = pool(ctr[None], wh[None])
        return l2_normalize(emb[0].astype(jnp.float32))

    @jax.jit
    def cos_at(prm, frame, ctr, side, wh, offs_dev, tmpl):
        pool = make_dense_embedder(prm, frame, ctr, side, es)
        cand = ctr[None] + offs_dev
        cos, _ = pool.score(tmpl, cand, jnp.broadcast_to(wh, cand.shape))
        return cos

    return template_of, cos_at


def probe_clip(cfg, fns, prm, clip: str, frames: int = 48, seed: int = 0):
    src = open_source(f"synthetic:{clip}", frames, (480, 640), seed=seed)
    arr = np.stack(list(src)).astype(np.float32)
    truth = src.truth
    bbox = np.asarray(src.init_bbox, np.float32)
    wh = bbox[2:]
    side = float(cfg.tracker.search_scale * np.sqrt(wh[0] * wh[1]))

    # Offsets: rings at fixed radii (8 directions each) + a sigma=3 cloud.
    rng = np.random.default_rng(0)
    ang = np.arange(8) * (2 * np.pi / 8)
    dirs = np.stack([np.cos(ang), np.sin(ang)], -1)
    rings = {r: (r * dirs).astype(np.float32) for r in (2.0, 3.0, 4.0, 8.0)}
    cloud = rng.normal(0.0, 3.0, size=(64, 2)).astype(np.float32)
    diag = float(np.hypot(*wh))
    bg = rng.uniform(0.5, 1.5, size=(64, 1)) * diag
    bg = (bg * dirs[rng.integers(0, 8, size=64)]).astype(np.float32)
    offs = np.concatenate(
        [np.zeros((1, 2), np.float32)] + list(rings.values()) + [cloud, bg]
    )
    n_ring = 1 + sum(len(v) for v in rings.values())

    template_of, cos_at = fns
    side_dev = jnp.float32(side)
    wh_dev = jnp.asarray(wh)
    offs_dev = jnp.asarray(offs)
    ctr0 = jnp.asarray(truth[0])
    tmpl = template_of(prm, jnp.asarray(arr[0]), ctr0, side_dev, wh_dev)

    probe_ts = [4, 12, 20, 28, 36, 44]
    rows = []
    for t in probe_ts:
        cos = np.asarray(
            cos_at(
                prm, jnp.asarray(arr[t]), jnp.asarray(truth[t]), side_dev,
                wh_dev, offs_dev, tmpl,
            ),
            np.float32,
        )
        c0 = cos[0]
        o = 1
        ring_mean = {}
        for r, v in rings.items():
            ring_mean[r] = float(cos[o : o + len(v)].mean())
            o += len(v)
        ccloud = cos[n_ring : n_ring + len(cloud)]
        cbg = cos[n_ring + len(cloud) :]
        rows.append(
            {
                "t": t,
                "cos0": float(c0),
                "drop2": float(c0 - ring_mean[2.0]),
                "drop3": float(c0 - ring_mean[3.0]),
                "drop4": float(c0 - ring_mean[4.0]),
                "drop8": float(c0 - ring_mean[8.0]),
                "cloud_std": float(ccloud.std()),
                "bg_mean": float(cbg.mean()),
                "bg_std": float(cbg.std()),
            }
        )

    def m(k):
        return float(np.mean([r[k] for r in rows]))

    return {
        "clip": clip,
        "cos0": round(m("cos0"), 4),
        "peak_drop_2": round(m("drop2"), 4),
        "peak_drop_4": round(m("drop4"), 4),
        "peak_drop_8": round(m("drop8"), 4),
        "cloud_snr": round(m("drop3") / max(m("cloud_std"), 1e-6), 2),
        "bg_sep": round((m("cos0") - m("bg_mean")) / max(m("bg_std"), 1e-6), 2),
        "tmpl_decay": round(rows[-1]["cos0"], 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--label", default="")
    ap.add_argument(
        "--clips",
        nargs="+",
        default=["moving-square", "needle", "photometric", "rotation"],
    )
    args = ap.parse_args()
    enable_compilation_cache()
    label = args.label or ("trained" if args.checkpoint else "random")
    cfg, es, prm = build(args.checkpoint)
    fns = build_fns(es)
    out = []
    for clip in args.clips:
        row = dict(probe_clip(cfg, fns, prm, clip), weights=label)
        print(json.dumps(row), flush=True)
        out.append(row)
    path = os.path.join(REPO, "docs", "diag_features.jsonl")
    seen = {}
    if os.path.exists(path):
        with open(path) as f:
            for ln in f:
                if ln.strip():
                    r = json.loads(ln)
                    seen[(r["weights"], r["clip"])] = r
    for r in out:
        seen[(r["weights"], r["clip"])] = r
    with open(path, "w") as f:
        for k in sorted(seen):
            f.write(json.dumps(seen[k]) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
