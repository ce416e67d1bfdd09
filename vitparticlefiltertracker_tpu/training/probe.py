"""Eval-in-the-loop tracking probe for feature training (round-2 VERDICT #2).

The InfoNCE ranking accuracy does NOT predict tracking RMSE (round 2: a
checkpoint at 0.94 ranking accuracy tracked 2x worse than random init), so
checkpoint selection must be closed on the metric that matters: run the
ACTUAL tracker on held-out synthetic clips with the current weights and
keep the parameters that track best. The probe builds its Tracker objects
ONCE (the jitted step takes weights as an argument, so swapping checkpoints
never recompiles) and re-runs init + whole-clip scan per evaluation.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def make_probe(
    train_cfg,
    clips: tuple[str, ...] = (
        "moving-square",
        "photometric",
        "rotation",
        "lookalikes",
    ),
    frames: int = 32,
    frame_size: tuple[int, int] = (480, 640),
    num_particles: int = 512,
    seed: int = 0,
) -> Callable[[dict], dict]:
    """Build probe(params) -> {"probe_rmse": mean, "probe_<clip>": rmse}.

    The probe geometry mirrors the flagship eval (tools/eval_quality.py):
    same model variant, dense mode, 480x640 clips — fewer particles and
    frames to keep each probe to a few device scans. Clip pixels and truth
    are generated once, staged to device once.
    """
    import jax
    import jax.numpy as jnp

    from vitparticlefiltertracker_tpu.config import Config
    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.models.params import resolve_vit_params
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config.from_dict(
        {
            "model": {
                "variant": train_cfg.model.variant,
                "image_size": 224,
                "dtype": "bfloat16" if on_tpu else "float32",
                "use_flash_attention": False,
                "scan_unroll": train_cfg.model.scan_unroll,
            },
            "filter": {"num_particles": num_particles},
            "tracker": {"mode": "dense"},
        }
    ).resolve()

    staged = []
    for clip in clips:
        src = open_source(f"synthetic:{clip}", frames, frame_size, seed=seed)
        arr = np.stack(list(src))
        staged.append(
            (
                clip,
                arr[0],
                jax.device_put(jnp.asarray(arr[1:])),
                src.truth[1:],
                np.asarray(src.init_bbox, np.float32),
            )
        )
    tracker = Tracker(cfg)  # jitted fns built once; weights are an argument

    def probe(params) -> dict:
        tracker.vit_params = jax.device_put(resolve_vit_params(cfg, params))
        out = {}
        for clip, frame0, clip_dev, truth, bbox in staged:
            tracker.init(frame0, bbox)
            outs = tracker.track_clip_device(clip_dev)
            pos = np.asarray(outs.position, np.float32)
            err = np.linalg.norm(pos - truth, axis=1)
            out[f"probe_{clip}"] = float(np.sqrt(np.mean(err**2)))
        out["probe_rmse"] = float(np.mean([v for v in out.values()]))
        return out

    return probe
