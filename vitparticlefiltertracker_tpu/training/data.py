"""On-device procedural scene-pair generator for feature training.

Generates (frame0, frame1) pairs with a known target box: frame0 provides
the template view, frame1 the search view after motion, photometric jitter,
camera shift, a distractor object, and (sometimes) partial occlusion. The
trainer teaches the embedder that the TRUE box in frame1 matches the
template better than offset/background/distractor boxes — exactly the
discrimination the particle filter's likelihood needs.

Everything is pure jnp and vmapped over the batch: data generation runs ON
THE TPU inside the jitted train step (the host in this rig has one CPU core
and a ~1 MB/s device link; host-side generation would starve the chip).
Randomization is deliberately much wider than the fixed-seed eval clips
(io/synthetic.py): texture scales, target sizes/aspects (needle-like
included), colors, contrast, noise — so evals measure generalization, not
memorization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.ops.image import extract_window_mxu


class SceneBatch(NamedTuple):
    frame0: jax.Array  # [B, S, S, 3] f32, 0..255 scale (pre-normalization)
    frame1: jax.Array  # [B, S, S, 3]
    p0: jax.Array  # [B, 2] target center in frame0 (x, y) px
    p1: jax.Array  # [B, 2] target center in frame1
    wh: jax.Array  # [B, 2] target box (w, h) px
    d1: jax.Array  # [B, 2] distractor center in frame1 — ranked as an
    # explicit hard negative (objective.py); for LOOKALIKE samples it sits
    # inside the search window with the target's colors/size
    look_on: jax.Array  # [B] 1.0 where the distractor is a lookalike clone
    # (so the objective can weight/report the hard subset separately)
    frame2: jax.Array  # [B, S, S, 3] frame1 WITHOUT the target (same
    # background/camera/distractor/photometric params): the target-absent
    # context of an occlusion. Window-mean centering makes every cosine
    # context-dependent, so a clone hinged low in windows that also
    # contain the true target can still peak high once the target is
    # occluded — the exact moment the lost/re-lock/re-detect gates fire.


def _octave(key: jax.Array, size: int, cells: int, lo: float, hi: float) -> jax.Array:
    """One bilinearly-upsampled random-grid texture octave [S, S, 3]."""
    g = jax.random.uniform(key, (cells, cells, 3), minval=lo, maxval=hi)
    return jax.image.resize(g, (size, size, 3), method="linear")


def _paint_blob(
    frame: jax.Array,  # [S, S, 3]
    p: jax.Array,  # [2] center (x, y)
    wh: jax.Array,  # [2] (w, h)
    colors: jax.Array,  # [3, 3] rows: core / rim / base per-channel weights
    gain: jax.Array,  # [] intensity gain
    enable: jax.Array,  # [] 0/1 (so vmapped samples can omit the blob)
    angle: jax.Array | float = 0.0,  # [] in-plane rotation (radians)
    spokes: jax.Array | float = 0.0,  # [] azimuthal harmonic amplitude
    spoke_k: jax.Array | float = 3.0,  # [] azimuthal harmonic count
) -> jax.Array:
    """Composite a soft-edged textured rectangle (radial core + rim, plus
    an optional azimuthal 'spoke' harmonic). The radial components alone
    are rotation-INVARIANT by construction; spokes give the pattern an
    orientation, which is what makes the rotation augmentation (and the
    io/synthetic.py `rotation` eval clip) actually change appearance."""
    s = frame.shape[0]
    yy, xx = jnp.mgrid[0:s, 0:s].astype(jnp.float32)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    ux = (xx - p[0])
    uy = (yy - p[1])
    # Rotate pattern AND silhouette: box-normalized coords of the rotated frame.
    rx = (ca * ux + sa * uy) / (wh[0] / 2.0)
    ry = (-sa * ux + ca * uy) / (wh[1] / 2.0)
    r = jnp.sqrt(rx * rx + ry * ry)
    core = jnp.clip(1.0 - r, 0.0, 1.0)
    rim = jnp.clip(r - 0.3, 0.0, 1.0)
    phi = jnp.arctan2(ry, rx)
    # Clamped so the final 0..255 clip doesn't flatten the modulation.
    core = jnp.clip(core * (1.0 + spokes * jnp.cos(spoke_k * phi)), 0.0, 1.0)
    # Soft ~1px box edge: alpha ramps with px distance to the box border.
    dist_px = jnp.minimum(
        (1.0 - jnp.abs(rx)) * (wh[0] / 2.0), (1.0 - jnp.abs(ry)) * (wh[1] / 2.0)
    )
    alpha = jnp.clip(dist_px + 0.5, 0.0, 1.0) * enable
    tex = (
        core[..., None] * colors[0]
        + rim[..., None] * colors[1]
        + colors[2]
    ) * gain
    return frame * (1.0 - alpha[..., None]) + tex * alpha[..., None]


def _sep_blur(img: jax.Array, sigma: jax.Array, on: jax.Array) -> jax.Array:
    """7-tap separable Gaussian blur (edge-padded shifted adds — static
    shapes, pure VPU). Mimics what a video CODEC does to fine pattern
    detail: the mp4 roundtrip eval (tools/eval_quality.py --mp4) low-passes
    the spoke harmonics that distinguish lookalike clones, and a head
    trained only on sharp pixels loses its discrimination there. `on`
    gates per sample; sigma is traced (tap weights recomputed per call)."""
    t = jnp.arange(-3, 4, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(t / jnp.maximum(sigma, 1e-3)))
    k = k / jnp.sum(k)

    def blur1d(x, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (3, 3)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for i in range(7):
            sl = [slice(None)] * 3
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    blurred = blur1d(blur1d(img, 0), 1)
    return jnp.where(on > 0, blurred, img)


def _synth_pair(
    key: jax.Array,
    size: int,
    look_frac: float = 0.35,
    blur_prob: float = 0.0,
    blur_sigma: float = 1.2,
) -> SceneBatch:
    """One scene pair; batch axes added by vmap in make_pair_batch."""
    ks = jax.random.split(key, 18)
    s = float(size)

    # --- background: two texture octaves, random coarse/fine balance -------
    bg = _octave(ks[0], size, 10, 25.0, 215.0) + _octave(ks[1], size, 40, -18.0, 18.0)

    # --- target geometry ----------------------------------------------------
    # Log-uniform width; aspect spans needle-like (h << w) to square-ish.
    tw = jnp.exp(jax.random.uniform(ks[2], (), minval=jnp.log(10.0), maxval=jnp.log(56.0)))
    aspect = jnp.exp(jax.random.uniform(ks[3], (), minval=jnp.log(0.15), maxval=jnp.log(1.3)))
    th = jnp.clip(tw * aspect, 5.0, 56.0)
    wh = jnp.stack([tw, th])

    p0 = jax.random.uniform(ks[4], (2,), minval=0.22 * s, maxval=0.78 * s)
    delta = 4.0 * jax.random.normal(ks[5], (2,))
    p1 = jnp.clip(p0 + delta, 0.18 * s, 0.82 * s)

    colors_t = jax.random.uniform(ks[6], (3, 3), minval=0.0, maxval=235.0)
    colors_d = jax.random.uniform(ks[7], (3, 3), minval=0.0, maxval=235.0)

    # --- distractor object (prob 0.7), kept away from the target -----------
    d_on = (jax.random.uniform(ks[8], ()) < 0.7).astype(jnp.float32)
    # Place opposite the target's frame half to avoid label-poisoning overlap.
    d_pos = jnp.where(p0 < s / 2, 0.75 * s, 0.25 * s) + 6.0 * jax.random.normal(ks[9], (2,))
    d_wh = wh * jnp.exp(0.2 * jax.random.normal(ks[10], (2,)))
    d_drift = 3.0 * jax.random.normal(ks[11], (2,))

    # --- LOOKALIKE mode (prob 0.35): the distractor clones the target's
    # colors and size, differs only in spoke harmonic (k=5/7 vs 3), and
    # sits INSIDE the search window at 1.3-2.3 target-widths from the true
    # box (no overlap -> no label poisoning). This is the discrimination
    # raw random projections cannot provide (same coarse color/shape); the
    # io/synthetic.py `lookalikes` eval clip measures exactly it. Both
    # objects carry spokes in this mode, else they'd be identical.
    k_lk, k_lr, k_la, k_lkk = jax.random.split(jax.random.fold_in(key, 55), 4)
    look_on = (jax.random.uniform(k_lk, ()) < look_frac).astype(jnp.float32)
    look_r = jnp.max(wh) * jax.random.uniform(k_lr, (), minval=1.3, maxval=2.3)
    look_th = jax.random.uniform(k_la, (), minval=0.0, maxval=2.0 * jnp.pi)
    look_pos = jnp.clip(
        p1 + look_r * jnp.stack([jnp.cos(look_th), jnp.sin(look_th)]),
        0.08 * s,
        0.92 * s,
    )
    look_k = jnp.where(jax.random.uniform(k_lkk, ()) < 0.5, 5.0, 7.0)
    d_on = jnp.maximum(d_on, look_on)  # lookalike samples always have one
    colors_d = jnp.where(look_on > 0, colors_t, colors_d)
    d_wh = jnp.where(look_on > 0, wh, d_wh)
    d_pos = jnp.where(look_on > 0, look_pos, d_pos)
    d_drift = jnp.where(look_on > 0, jnp.zeros(2), d_drift)
    d_spoke_k = jnp.where(look_on > 0, look_k, 3.0)

    # --- orientation: spoke texture + in-plane rotation between frames ----
    # Half the samples carry an azimuthal harmonic (orientation-bearing
    # pattern) at a random base angle. The template->search rotation delta
    # is a CURRICULUM mixture: 70% mild (+/-8.6 deg — one frame of the
    # `rotation` eval clip) keeps the localization peak sharp; 30% wide
    # (+/-26 deg) covers the template-EMA lag on fast rotation (the eval
    # clip rotates 8 deg/frame while the EMA absorbs ~3). A uniform +/-26
    # band on ALL samples was tried in round 2 and REVERTED (ranking acc
    # 0.94 -> 0.75, inflated background cosines false-locked re-detection);
    # the mixture keeps the sharp majority while the tail teaches the
    # invariance.
    k_sp, k_a0, k_da, k_wide = jax.random.split(jax.random.fold_in(key, 77), 4)
    # Lookalike samples force spokes ON (the harmonic count is the ONLY
    # difference between target and distractor there).
    spoke_amp = jnp.where(
        (jax.random.uniform(k_sp, ()) < 0.5) | (look_on > 0), 0.6, 0.0
    )
    ang0 = jax.random.uniform(k_a0, (), minval=0.0, maxval=2.0 * jnp.pi)
    band = jnp.where(jax.random.uniform(k_wide, ()) < 0.3, 0.45, 0.15)
    d_ang = band * jax.random.uniform(k_da, (), minval=-1.0, maxval=1.0)

    def compose(bg_img, tp, dp, tgain, ang):
        f = _paint_blob(
            bg_img, dp, d_wh, colors_d, 1.0, d_on,
            spokes=jnp.where(look_on > 0, 0.6, 0.0), spoke_k=d_spoke_k,
        )
        return _paint_blob(
            f, tp, wh, colors_t, tgain, jnp.float32(1.0),
            angle=ang, spokes=spoke_amp,
        )

    frame0 = compose(bg, p0, d_pos, jnp.float32(1.0), ang0)

    # --- frame1: camera shift + photometric jitter + partial occluder ------
    cam = 2.5 * jax.random.normal(ks[12], (2,))
    ctr = jnp.asarray([s / 2, s / 2]) + cam
    bg1 = extract_window_mxu(bg, ctr, jnp.float32(s), size)
    tgain1 = jnp.exp(0.12 * jax.random.normal(ks[13], ()))
    frame1 = compose(bg1, p1, d_pos + d_drift, tgain1, ang0 + d_ang)
    # frame2: the same scene with the target fully occluded (absent) —
    # only the distractor is painted. See SceneBatch.frame2.
    frame2 = _paint_blob(
        bg1, d_pos + d_drift, d_wh, colors_d, 1.0, d_on,
        spokes=jnp.where(look_on > 0, 0.6, 0.0), spoke_k=d_spoke_k,
    )

    occ_on = (jax.random.uniform(ks[14], ()) < 0.25).astype(jnp.float32)
    occ_x = p1[0] + jax.random.uniform(ks[15], (), minval=-0.8, maxval=0.8) * tw
    occ_w = jnp.clip(0.5 * tw, 3.0, 20.0)
    xs = jnp.arange(size, dtype=jnp.float32)
    occ_mask = (jnp.abs(xs - occ_x) < occ_w / 2).astype(jnp.float32) * occ_on
    occ_color = jax.random.uniform(ks[16], (3,), minval=40.0, maxval=160.0)
    frame1 = frame1 * (1.0 - occ_mask)[None, :, None] + occ_color * occ_mask[None, :, None]

    # Codec-like low-pass (see _sep_blur): one sigma per pair, applied to
    # ALL THREE views — a real mp4 roundtrip degrades the template frame
    # and the search frames alike. Applied pre-noise (codecs smooth the
    # scene; sensor/quantization noise rides on top of the decode).
    if blur_prob > 0.0:
        k_bl, k_bs = jax.random.split(jax.random.fold_in(key, 131), 2)
        bl_on = (jax.random.uniform(k_bl, ()) < blur_prob).astype(jnp.float32)
        bl_sig = jax.random.uniform(k_bs, (), minval=0.3, maxval=blur_sigma)
        frame0 = _sep_blur(frame0, bl_sig, bl_on)
        frame1 = _sep_blur(frame1, bl_sig, bl_on)
        frame2 = _sep_blur(frame2, bl_sig, bl_on)

    gain = jnp.exp(0.22 * jax.random.normal(ks[17], ()))
    k_noise0, k_noise1, k_bias, k_cg = jax.random.split(
        jax.random.fold_in(key, 99), 4
    )
    # Per-channel gain (white-balance drift) on top of global gain/bias.
    # Bands sized to COVER the io/synthetic.py `photometric` eval clip
    # (gain sigma 0.18, ch sigma 0.10, bias +/-24, noise sigma 5): round 2
    # trained slightly narrower and lost to random init on exactly that
    # clip — invariance must be trained at least as wide as it is tested.
    ch_gain = jnp.exp(0.12 * jax.random.normal(k_cg, (3,)))
    bias = jax.random.uniform(k_bias, (), minval=-26.0, maxval=26.0)
    frame0 = frame0 + 3.0 * jax.random.normal(k_noise0, frame0.shape)
    frame1 = (
        frame1 * (gain * ch_gain) + bias + 5.0 * jax.random.normal(k_noise1, frame1.shape)
    )
    # Same photometric params as frame1 (it IS frame1's scene, target
    # removed); independent sensor noise.
    k_noise2 = jax.random.fold_in(key, 111)
    frame2 = (
        frame2 * (gain * ch_gain) + bias + 5.0 * jax.random.normal(k_noise2, frame2.shape)
    )

    return SceneBatch(
        frame0=jnp.clip(frame0, 0.0, 255.0),
        frame1=jnp.clip(frame1, 0.0, 255.0),
        p0=p0,
        p1=p1,
        wh=wh,
        d1=d_pos + d_drift,
        look_on=look_on,
        frame2=jnp.clip(frame2, 0.0, 255.0),
    )


def make_pair_batch(
    key: jax.Array,
    batch: int,
    size: int,
    look_frac: float = 0.35,
    blur_prob: float = 0.0,
    blur_sigma: float = 1.2,
) -> SceneBatch:
    """[B]-batched scene pairs; jit/vmap-safe, counter-based (fold_in step).

    look_frac (train.lookalike_frac): fraction of samples whose distractor
    is a lookalike clone. Residual-head training raises it — discrimination
    is the head's ONLY job, so most of its gradient should come from the
    hard subset. blur_prob/blur_sigma (train.blur_*): codec-like low-pass
    augmentation, see _sep_blur."""
    return jax.vmap(
        lambda k: _synth_pair(k, size, look_frac, blur_prob, blur_sigma)
    )(jax.random.split(key, batch))
