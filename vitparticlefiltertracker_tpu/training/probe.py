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

# Per-clip tracker overrides, mirroring tools/eval_quality.py CLIP_OVERRIDES:
# the lookalikes clip is only meaningful under the robustness stack (relative
# lost gate + global re-detection + re-lock hysteresis) — without it the probe
# measures drift-onto-impostor with no escape path, a failure no checkpoint
# can influence, and eval-in-the-loop selection (round-2 VERDICT #2) would
# select on noise. Keys are dotted config paths (config.apply_override).
PROBE_OVERRIDES: dict[str, dict[str, str]] = {
    "lookalikes": {
        "filter.lost_conf_ratio": "0.55",
        "tracker.redetect_global_after": "4",
        "tracker.relock_conf_ratio": "0.9",
        "tracker.redetect_accept_ratio": "0.85",
        "tracker.redetect_accept_z": "3.0",
    },
}


def _blur_clip(arr: np.ndarray, sigma: float) -> np.ndarray:
    """Separable 7-tap Gaussian over a uint8 clip [T, H, W, 3] (host-side
    numpy; probe staging only)."""
    t = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-0.5 * np.square(t / sigma))
    k /= k.sum()
    x = arr.astype(np.float32)
    for axis in (1, 2):
        pad = [(0, 0)] * 4
        pad[axis] = (3, 3)
        xp = np.pad(x, pad, mode="edge")
        acc = np.zeros_like(x)
        for i in range(7):
            sl = [slice(None)] * 4
            sl[axis] = slice(i, i + x.shape[axis])
            acc += k[i] * xp[tuple(sl)]
        x = acc
    return np.clip(x, 0, 255).astype(np.uint8)


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
    image_size: int = 224,
) -> Callable[[dict], dict]:
    """Build probe(params) -> {"probe_rmse": mean, "probe_<clip>": rmse}.

    The probe geometry mirrors the flagship eval (tools/eval_quality.py):
    same model variant, dense mode, 480x640 clips — fewer particles and
    frames to keep each probe to a few device scans. Clip pixels and truth
    are generated once, staged to device once.
    """
    import jax
    import jax.numpy as jnp

    from vitparticlefiltertracker_tpu.config import Config, apply_override
    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.models.params import resolve_vit_params
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

    on_tpu = jax.default_backend() == "tpu"
    base = {
        "model": {
            "variant": train_cfg.model.variant,
            "image_size": image_size,
            "dtype": "bfloat16" if on_tpu else "float32",
            "use_flash_attention": False,
            "scan_unroll": train_cfg.model.scan_unroll,
            # Residual-head runs (configs/train-head.yaml): the probe must
            # score the SAME blended split-cosine the tracker will serve.
            "head_depth": train_cfg.model.head_depth,
            "head_blend": train_cfg.model.head_blend,
        },
        "filter": {"num_particles": num_particles},
        "tracker": {"mode": "dense"},
    }

    # One Tracker per distinct override set (the robustness gates change the
    # traced step, so gated clips can't share the ungated tracker's jit).
    cfgs: dict[frozenset, tuple] = {}
    staged = []
    for clip in clips:
        fam = clip[: -len("+blur")] if clip.endswith("+blur") else clip
        ov = PROBE_OVERRIDES.get(fam, {})
        ck = frozenset(ov.items())
        if ck not in cfgs:
            cfg = Config.from_dict(base)
            for path, val in ov.items():
                apply_override(cfg, f"{path}={val}")
            cfg = cfg.resolve()
            cfgs[ck] = (cfg, Tracker(cfg))
        cfg, tracker = cfgs[ck]
        src = open_source(f"synthetic:{fam}", frames, frame_size, seed=seed)
        arr = np.stack(list(src))
        if clip.endswith("+blur"):
            # Codec-proxy probe (train.blur_* augmentation): a 7-tap
            # sigma=1.0 Gaussian approximates what the mp4 roundtrip eval
            # does to fine pattern detail, without paying a cv2 encode in
            # the training loop. Selection then sees the blurred regime.
            arr = _blur_clip(arr, 1.0)
        staged.append(
            (
                clip,
                tracker,
                cfg,
                arr[0],
                jax.device_put(jnp.asarray(arr[1:])),
                src.truth[1:],
                np.asarray(src.init_bbox, np.float32),
            )
        )

    def probe(params) -> dict:
        resolved = {
            id(cfg): jax.device_put(resolve_vit_params(cfg, params))
            for cfg, _ in cfgs.values()
        }
        out = {}
        for clip, tracker, cfg, frame0, clip_dev, truth, bbox in staged:
            tracker.vit_params = resolved[id(cfg)]
            tracker.init(frame0, bbox)
            outs = tracker.track_clip_device(clip_dev)
            pos = np.asarray(outs.position, np.float32)
            err = np.linalg.norm(pos - truth, axis=1)
            out[f"probe_{clip}"] = float(np.sqrt(np.mean(err**2)))
        out["probe_rmse"] = float(np.mean([v for v in out.values()]))
        return out

    return probe
