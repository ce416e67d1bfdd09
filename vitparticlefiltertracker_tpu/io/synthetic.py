"""Synthetic tracking clips with known ground-truth trajectories.

Drives the eval configs of BASELINE.md ("30-frame 224px synthetic clip",
occlusion clip, needle clip, surveillance feed) without shipping video
assets: procedurally generated, seeded, with exact ground-truth centers for
RMSE checks (SURVEY.md §4.2 "synthetic-clip fixtures").

All generators return (frames [T, H, W, 3] uint8, truth [T, 2] float32
centers (x, y), init_bbox [4] float32 (x, y, w, h)).
"""

from __future__ import annotations

import numpy as np


def _textured_background(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Low-frequency RGB texture so features are non-degenerate."""
    small = rng.uniform(40, 200, size=(h // 16 + 2, w // 16 + 2, 3))
    ys = np.linspace(0, small.shape[0] - 1.001, h)
    xs = np.linspace(0, small.shape[1] - 1.001, w)
    y0, x0 = ys.astype(int), xs.astype(int)
    fy, fx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    a = small[y0][:, x0] * (1 - fy) * (1 - fx) + small[y0][:, x0 + 1] * (1 - fy) * fx
    b = small[y0 + 1][:, x0] * fy * (1 - fx) + small[y0 + 1][:, x0 + 1] * fy * fx
    return a + b


def _draw_target(frame: np.ndarray, cx: float, cy: float, w: float, h: float,
                 pattern: np.ndarray) -> None:
    """Paint a textured rectangle (the target) with sub-pixel snapping."""
    hh, ww = frame.shape[:2]
    x0, y0 = int(round(cx - w / 2)), int(round(cy - h / 2))
    x1, y1 = x0 + int(w), y0 + int(h)
    sx0, sy0 = max(0, -x0), max(0, -y0)
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(ww, x1), min(hh, y1)
    if x1 <= x0 or y1 <= y0:
        return
    patch = pattern[sy0 : sy0 + (y1 - y0), sx0 : sx0 + (x1 - x0)]
    frame[y0:y1, x0:x1] = patch


def make_clip(
    name: str,
    num_frames: int = 30,
    height: int = 224,
    width: int = 224,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Procedural clip registry for `io.source: synthetic:<name>`.

    Names:
      moving-square   — textured square, linear + sinusoidal motion
      occlusion       — same, plus an occluder bar sweeping over the target
      needle          — thin bright elongated target (medical use case,
                        reference README.md:48)
      surveillance    — small fast target on busy background (README.md:50)
      teleport        — target vanishes mid-clip and REAPPEARS at a distant
                        location (exercises global re-detection: the local
                        search window cannot recover this; README.md:3
                        "dynamic and complex environments"). Truth during
                        the hidden gap is pinned to the reappearance point;
                        score only frames after `teleport_times()[1]`.
      photometric     — moving-square motion under strong per-frame
                        photometric perturbation (global+per-channel gain,
                        bias, heavy sensor noise): the appearance-invariance
                        stressor (README.md:3 "dynamic environments") where
                        learned features must beat raw random projections.
      rotation        — orientation-bearing target (azimuthal spoke pattern)
                        rotating in-plane 8 deg/frame while translating:
                        raw pixel correlation against a fixed template
                        decays with angle; features trained with the
                        rotation augmentation (training/data.py) must not.
      lookalikes      — the object-RECOGNITION stressor (reference
                        README.md:7, surveillance README.md:50): a
                        same-color same-size IMPOSTOR (k=5 spoke harmonic
                        vs the target's 3) moves in and SHADOWS the target
                        inside its search window; mid-clip an occluder bar
                        hides the TARGET only, for ~8 frames. With the lost
                        gate + global re-detection enabled (the occlusion
                        robustness stack), the whole-frame scan sees only
                        the impostor while the target is hidden — whether
                        the tracker false-locks on it (and stays stuck
                        after the target re-emerges) is decided purely by
                        how well the features separate clone pattern
                        detail, NOT by the motion prior. A second k=7
                        distractor crosses later. The particle filter's
                        locality defends ordinary crossings (measured:
                        random-init ViT-B tracks a plain crossing at
                        1.6 px); this clip removes that defense.
    """
    rng = np.random.default_rng(seed)
    bg = _textured_background(rng, height, width)

    scale = min(height, width) / 224.0
    if name == "needle":
        tw, th = max(8, int(60 * scale)), max(4, int(8 * scale))
    elif name == "surveillance":
        tw = th = max(8, int(16 * scale))
    else:
        tw = th = max(8, int(32 * scale))

    # High-contrast but SMOOTH target texture: a radial color gradient.
    # Smoothness matters — fine periodic patterns (e.g. a 4px checker) invert
    # phase under ~2px/frame motion, making the target's own appearance
    # anti-correlate frame to frame, which no appearance tracker can match.
    yy, xx = np.mgrid[0:th, 0:tw]
    ry = (yy - (th - 1) / 2) / (th / 2)
    rx = (xx - (tw - 1) / 2) / (tw / 2)

    def _pattern(angle: float = 0.0, spokes_k: int = 0) -> np.ndarray:
        ca, sa = np.cos(angle), np.sin(angle)
        qx, qy = ca * rx + sa * ry, -sa * rx + ca * ry
        r = np.sqrt(qx**2 + qy**2)
        core = np.clip(1.0 - r, 0.0, 1.0)  # 1 at center -> 0 at edge
        if spokes_k:
            # Azimuthal spokes: the radial gradient alone is rotation-
            # invariant, so a rotating clip must carry orientation — and the
            # harmonic count k is what tells lookalikes apart. Clamped to 1
            # so the u8 clip below doesn't flatten the modulation.
            core = np.clip(
                core * (1.0 + 0.6 * np.cos(spokes_k * np.arctan2(qy, qx))),
                0.0,
                1.0,
            )
        return np.stack(
            [
                40 + 215 * core,  # bright warm core
                30 + 120 * core * core,
                200 * np.clip(r - 0.3, 0, 1),  # bluish rim
            ],
            axis=-1,
        )

    pattern = _pattern(spokes_k=3 if name in ("rotation", "lookalikes") else 0)
    # Lookalike distractors (same colors, size, radial profile):
    #   #1 the IMPOSTOR — k=5 spoke harmonic, approaches until lk_hold and
    #      then shadows the target permanently at ~1.4 target widths,
    #      offset mostly in +x so the target-covering occluder bar (width
    #      tw, tracking the target) never touches it;
    #   #2 a k=7-harmonic distractor crossing later.
    # The occluder bar hides the TARGET for lk_occ..lk_occ+lk_span frames —
    # while it is hidden the impostor is the scene's only template-like
    # object, so global re-detection must judge it on pattern detail alone.
    if name == "lookalikes":
        look_pats = [_pattern(spokes_k=5), _pattern(spokes_k=7)]
        look_dirs = [
            np.asarray([1.0, 0.25]) / np.hypot(1.0, 0.25),
            np.asarray([-0.6, 1.0]) / np.hypot(0.6, 1.0),
        ]
        lk_hold = int(num_frames * 0.3)
        lk_occ, lk_span = int(num_frames * 0.42), max(5, num_frames // 6)
        t_mid = [lk_hold, int(num_frames * 0.8)]

    margin = max(tw, th)
    cx0, cy0 = width * 0.35, height * 0.4
    speed = 2.0 * scale
    amp = height * 0.12

    t_hide, t_show = teleport_times(num_frames)
    frames = np.empty((num_frames, height, width, 3), np.uint8)
    truth = np.empty((num_frames, 2), np.float32)
    for t in range(num_frames):
        cx = cx0 + speed * t
        cy = cy0 + amp * np.sin(2 * np.pi * t / max(30, num_frames))
        visible = True
        if name == "teleport" and t >= t_hide:
            # Re-entry point far from the pre-gap trajectory (different
            # frame quadrant), then slow linear motion.
            cx = width * 0.75 + 0.5 * speed * max(0, t - t_show)
            cy = height * 0.72
            visible = t >= t_show
        cx = np.clip(cx, margin, width - margin)
        cy = np.clip(cy, margin, height - margin)
        f = bg.copy()
        # mild background flicker / sensor noise
        f += rng.normal(0, 2.0, size=f.shape)
        if name == "rotation":
            # 8 deg/frame: too fast for template-EMA drift absorption
            # (which tracks ~3 deg/frame), well inside the trainer's
            # +/-26 deg/pair augmentation band.
            pattern = _pattern(np.deg2rad(8.0) * t, spokes_k=3)
        if name == "lookalikes":
            # Draw distractors FIRST so the target wins any overlap pixels.
            gap = 1.4 * tw
            # Impostor: approach until lk_hold, then shadow permanently.
            off = look_dirs[0] * (gap + 1.5 * speed * max(0.0, t_mid[0] - t))
            dx = np.clip(cx + off[0], margin, width - margin)
            dy = np.clip(cy + off[1], margin, height - margin)
            _draw_target(f, dx, dy, tw, th, look_pats[0])
            # Crossing k=7 distractor.
            off = look_dirs[1] * (gap + 1.5 * speed * abs(t - t_mid[1]))
            dx = np.clip(cx + off[0], margin, width - margin)
            dy = np.clip(cy + off[1], margin, height - margin)
            _draw_target(f, dx, dy, tw, th, look_pats[1])
        if visible:
            _draw_target(f, cx, cy, tw, th, pattern)
        if name == "lookalikes" and lk_occ <= t < lk_occ + lk_span:
            # Target-covering bar (width tw, full height, tracks the
            # target): hides the target box exactly; the impostor sits
            # ~1.36*tw away in +x, outside the bar.
            ox = int(cx - tw / 2)
            f[:, max(0, ox) : max(0, ox) + tw] = np.array([90.0, 90.0, 90.0])
        if name == "occlusion" and num_frames // 3 <= t < num_frames // 3 + max(5, num_frames // 6):
            # occluder bar sweeps across the target region
            ox = int(cx - tw)
            f[:, max(0, ox) : max(0, ox) + 2 * tw] = np.array([90.0, 90.0, 90.0])
        if name == "photometric":
            # Per-frame exposure/white-balance/noise jitter, wider than the
            # feature trainer's augmentation band (training/data.py) so the
            # eval measures generalization of the learned invariance.
            gain = np.exp(rng.normal(0.0, 0.18))
            ch_gain = np.exp(rng.normal(0.0, 0.10, size=3))
            f = f * (gain * ch_gain)[None, None, :] + rng.uniform(-24.0, 24.0)
            f += rng.normal(0, 5.0, size=f.shape)
        frames[t] = np.clip(f, 0, 255).astype(np.uint8)
        truth[t] = (cx, cy)

    init_bbox = np.array(
        [truth[0, 0] - tw / 2, truth[0, 1] - th / 2, tw, th], np.float32
    )
    return frames, truth, init_bbox


def teleport_times(num_frames: int) -> tuple[int, int]:
    """(hide_frame, reappear_frame) for the `teleport` clip."""
    t_hide = num_frames // 3
    return t_hide, t_hide + max(4, num_frames // 8)


def make_multi_clip(
    num_targets: int,
    num_frames: int = 30,
    height: int = 224,
    width: int = 224,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """K independently-moving, distinctly-textured targets on one clip.

    The reference's surveillance use case (README.md:50) is multi-object;
    this drives MultiTracker quality tests (truth [T, K, 2], bboxes [K, 4]).
    Targets start well-separated on a K-cell grid and move with per-target
    linear + sinusoidal motion.
    """
    rng = np.random.default_rng(seed)
    bg = _textured_background(rng, height, width)
    k = num_targets
    scale = min(height, width) / 224.0
    tw = th = max(8, int(28 * scale))
    margin = tw

    # Distinct hue per target: rotate the radial-gradient channel weights.
    yy, xx = np.mgrid[0:th, 0:tw]
    ry = (yy - (th - 1) / 2) / (th / 2)
    rx = (xx - (tw - 1) / 2) / (tw / 2)
    r = np.sqrt(rx**2 + ry**2)
    core = np.clip(1.0 - r, 0.0, 1.0)
    rim = 200 * np.clip(r - 0.3, 0, 1)
    # Continuous hue rotation: k DISTINCT patterns. (The old discrete
    # channel rotation had period 3, so targets i and i+3 were pixel-
    # identical — crossing twins are unresolvable by ANY appearance model
    # and eval4 runs tanked on the inevitable identity swap.)
    chans = [40 + 215 * core, 30 + 120 * core * core, rim]
    base = np.stack(chans, axis=-1)  # [th, tw, 3]
    patterns = []
    for i in range(k):
        hue = 3.0 * i / k
        j0, frac = int(hue) % 3, hue - int(hue)
        a = base[..., [(j0 + c) % 3 for c in range(3)]]
        b = base[..., [(j0 + 1 + c) % 3 for c in range(3)]]
        patterns.append((1.0 - frac) * a + frac * b)

    # Starting cells on a ceil(sqrt(K)) grid; per-target velocity/phase.
    side = int(np.ceil(np.sqrt(k)))
    starts = []
    for i in range(k):
        gy, gx = divmod(i, side)
        starts.append(
            (
                width * (0.5 + gx) / side,
                height * (0.5 + gy) / side,
            )
        )
    vels = rng.uniform(-2.0, 2.0, size=(k, 2)) * scale
    phases = rng.uniform(0, 2 * np.pi, size=k)
    amp = height * 0.06

    frames = np.empty((num_frames, height, width, 3), np.uint8)
    truth = np.empty((num_frames, k, 2), np.float32)
    for t in range(num_frames):
        f = bg.copy()
        f += rng.normal(0, 2.0, size=f.shape)
        for i in range(k):
            cx = starts[i][0] + vels[i, 0] * t
            cy = starts[i][1] + vels[i, 1] * t + amp * np.sin(
                2 * np.pi * t / max(30, num_frames) + phases[i]
            )
            cx = np.clip(cx, margin, width - margin)
            cy = np.clip(cy, margin, height - margin)
            _draw_target(f, cx, cy, tw, th, patterns[i])
            truth[t, i] = (cx, cy)
        frames[t] = np.clip(f, 0, 255).astype(np.uint8)

    init_bboxes = np.stack(
        [
            np.array(
                [truth[0, i, 0] - tw / 2, truth[0, i, 1] - th / 2, tw, th],
                np.float32,
            )
            for i in range(k)
        ]
    )
    return frames, truth, init_bboxes


def parse_synthetic_source(source: str) -> str:
    assert source.startswith("synthetic:"), source
    return source.split(":", 1)[1]
