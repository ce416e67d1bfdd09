#!/usr/bin/env python
"""Lookalikes-clip feature separation: per-frame cosine at the TRUE target
vs at the IMPOSTOR, each scored in its own self-centered search window (the
re-detection geometry), split by feature half (trunk / head / blend).

This isolates what tools/eval_quality.py confounds: whether a false-lock
comes from the FEATURES (impostor cosine ~ target cosine) or from the GATE
DYNAMICS (features separate, but the lost/re-lock/accept machinery lets the
impostor through anyway). The impostor trajectory is recomputed from
io/synthetic.py's closed form (impostor = truth + dir0 * (1.4*tw +
1.5*speed*max(0, t_hold - t)), clipped to margins).

Usage:
  python tools/diag_lookalikes.py --checkpoint checkpoints/vit_b16_head.npz \
      --head-depth 2 --seeds 0 1 2
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
from vitparticlefiltertracker_tpu.models.params import resolve_vit_params
from vitparticlefiltertracker_tpu.ops.likelihood import (
    _cos_to_template,
    l2_normalize_split,
)
from vitparticlefiltertracker_tpu.utils.cache import enable_compilation_cache


def impostor_path(truth: np.ndarray, tw: float, frames: int, size) -> np.ndarray:
    """io/synthetic.py lookalikes impostor #1, recomputed (see make_clip)."""
    h, w = size
    scale = min(h, w) / 224.0
    speed = 2.0 * scale
    gap = 1.4 * tw
    d = np.asarray([1.0, 0.25]) / np.hypot(1.0, 0.25)
    t_hold = int(frames * 0.3)
    margin = tw  # tw == th == max(8, 32*scale) for this clip
    out = np.empty_like(truth)
    for t in range(frames):
        off = d * (gap + 1.5 * speed * max(0.0, t_hold - t))
        out[t] = [
            np.clip(truth[t, 0] + off[0], margin, w - margin),
            np.clip(truth[t, 1] + off[1], margin, h - margin),
        ]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--head-depth", type=int, default=0)
    ap.add_argument("--blend", type=float, default=0.5)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--per-frame", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config.from_dict(
        {
            "model": {
                "variant": "vit-b16",
                "image_size": 224,
                "dtype": "bfloat16" if on_tpu else "float32",
                "use_flash_attention": False,
                "checkpoint": args.checkpoint,
                "head_depth": args.head_depth,
                "head_blend": args.blend,
            },
            "tracker": {"mode": "dense"},
        }
    )
    es = DenseEmbedSpec.from_config(cfg)
    prm = jax.device_put(resolve_vit_params(cfg))
    d_trunk = es.vit.dim

    def cos_parts(emb, tmpl):
        if es.split is None:
            c = _cos_to_template(emb, tmpl)[0]
            return jnp.stack([c, c, c])
        ct = _cos_to_template(emb, tmpl, (d_trunk, 0.0))[0]
        ch = _cos_to_template(emb, tmpl, (d_trunk, 1.0))[0]
        cb = _cos_to_template(emb, tmpl, es.split)[0]
        return jnp.stack([ct, ch, cb])

    @jax.jit
    def score_at(prm, frame, ctr, wh, tmpl):
        """Self-centered window at ctr; cosine of the box AT ctr."""
        side = jnp.maximum(
            cfg.tracker.search_scale * jnp.sqrt(wh[0] * wh[1]),
            jnp.float32(64.0),
        )
        pool = make_dense_embedder(prm, frame.astype(jnp.float32), ctr, side, es)
        emb, _ = pool(ctr[None], wh[None])
        return cos_parts(emb.astype(jnp.float32), tmpl)

    @jax.jit
    def template_of(prm, frame, ctr, wh):
        side = jnp.maximum(
            cfg.tracker.search_scale * jnp.sqrt(wh[0] * wh[1]),
            jnp.float32(64.0),
        )
        pool = make_dense_embedder(prm, frame.astype(jnp.float32), ctr, side, es)
        emb, _ = pool(ctr[None], wh[None])
        return l2_normalize_split(emb[0].astype(jnp.float32), es.split)

    size = (480, 640)
    for seed in args.seeds:
        src = open_source(f"synthetic:lookalikes", args.frames, size, seed=seed)
        frames = np.stack(list(src))
        truth = src.truth
        tw = float(src.init_bbox[2])
        imp = impostor_path(truth, tw, args.frames, size)
        wh = jnp.asarray(src.init_bbox[2:], jnp.float32)
        f0 = jax.device_put(jnp.asarray(frames[0]))
        tmpl = template_of(prm, f0, jnp.asarray(truth[0]), wh)

        lk_occ = int(args.frames * 0.42)
        lk_span = max(5, args.frames // 6)
        rows = []
        for t in range(1, args.frames):
            f = jax.device_put(jnp.asarray(frames[t]))
            hidden = lk_occ <= t < lk_occ + lk_span
            ct = np.asarray(score_at(prm, f, jnp.asarray(truth[t]), wh, tmpl))
            ci = np.asarray(score_at(prm, f, jnp.asarray(imp[t]), wh, tmpl))
            rows.append((t, hidden, ct, ci))
            if args.per_frame:
                print(
                    f"seed{seed} t={t:02d}{' OCC' if hidden else '    '} "
                    f"truth(trunk/head/blend)={ct[0]:.3f}/{ct[1]:.3f}/{ct[2]:.3f} "
                    f"imp={ci[0]:.3f}/{ci[1]:.3f}/{ci[2]:.3f} "
                    f"ratio_blend={ci[2] / max(ct[2], 1e-6):.2f}"
                )
        vis = [r for r in rows if not r[1]]
        occ = [r for r in rows if r[1]]
        summ = {
            "seed": seed,
            "truth_blend_vis": round(float(np.mean([r[2][2] for r in vis])), 3),
            "imp_blend_vis": round(float(np.mean([r[3][2] for r in vis])), 3),
            "imp_blend_occ": round(float(np.mean([r[3][2] for r in occ])), 3),
            "truth_trunk_vis": round(float(np.mean([r[2][0] for r in vis])), 3),
            "imp_trunk_vis": round(float(np.mean([r[3][0] for r in vis])), 3),
            "truth_head_vis": round(float(np.mean([r[2][1] for r in vis])), 3),
            "imp_head_vis": round(float(np.mean([r[3][1] for r in vis])), 3),
            "imp_head_occ": round(float(np.mean([r[3][1] for r in occ])), 3),
        }
        print(json.dumps(summ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
