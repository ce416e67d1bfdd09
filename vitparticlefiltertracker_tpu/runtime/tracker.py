"""Tracker orchestration (component B9): init(frame, bbox) / step(frame).

Implements the reference's observable behavior — video/images in, per-frame
tracked positions out, in real time (/root/reference/README.md:42) — as ONE
jitted device function per frame (SURVEY.md §3.2(a)): propagate -> extract ->
ViT -> likelihood -> estimate -> resample, with zero host round-trips inside
the step. The only per-frame D2H transfer is the small output record; the
only H2D is the raw uint8 frame. TrackerState is donated every step, so the
particle set is updated in place in HBM.

Two appearance modes (config tracker.mode, see config.py TrackerConfig):
dense (one ViT forward on the search window + ROI-pooled per-particle
embeddings) and crop (fused gather+patchify of N crops -> one batched ViT
forward).
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.filters.particle import (
    MotionParams,
    PFParams,
    PFState,
    draw_step_noise,
    init_state,
    pf_update,
    propagate,
)
from vitparticlefiltertracker_tpu.models.embedder import (
    DenseEmbedSpec,
    make_dense_embedder,
    tiled_window_embed,
)
from vitparticlefiltertracker_tpu.models.vit import (
    VitSpec,
    encode_tokens,
    pool_tokens,
)
from vitparticlefiltertracker_tpu.ops.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    FrameView,
    StreamFrame,
    frame_to_window_coords,
    full_view,
    view_extract_window_mxu,
)
from vitparticlefiltertracker_tpu.ops.likelihood import (
    auto_blend_target,
    cosine_log_likelihood,
    l2_normalize,
    l2_normalize_split,
    landscape_spread,
    znormed_log_likelihood,
    znormed_logits_from_cos,
)
from vitparticlefiltertracker_tpu.ops.patchify import gather_patchify
from vitparticlefiltertracker_tpu.ops.patchify_pallas import (
    gather_patchify_window_pallas,
    window_gather_patchify_xla,
)


class TrackerState(NamedTuple):
    """Device-resident tracker state pytree (SURVEY.md §3.2(b))."""

    pf: PFState
    template: jax.Array  # [D] f32, L2-normalized ADAPTIVE template (EMA)
    anchor: jax.Array  # [D] f32, immutable first-frame template
    box_wh: jax.Array  # [2] f32 base box (w, h) at log_s = 0
    center: jax.Array  # [2] f32 search-window center (prev estimate)
    prev_scale: jax.Array  # [] f32 last estimated scale factor exp(log_s)
    key: jax.Array  # base PRNG key; per-frame keys fold in frame_idx
    frame_idx: jax.Array  # [] int32
    conf: jax.Array  # [] f32 last appearance confidence (max cosine)
    lost: jax.Array  # [] bool target-lost flag (SURVEY.md §5.3)
    lost_count: jax.Array  # [] int32 consecutive lost frames (global re-detect)
    conf_ema: jax.Array  # [] f32 locked-state confidence EMA (-1 = unseeded);
    # baseline for the relative lost gate (filter.lost_conf_ratio)
    coast_xy: jax.Array  # [2] f32 last-locked position, advanced by coast_vel
    # while lost — the OUTPUT trajectory coasts instead of chasing the
    # boosted-noise posterior mean (the filter itself is untouched)
    coast_vel: jax.Array  # [2] f32 last-locked velocity
    coast_acc: jax.Array  # [2] f32 EMA of per-frame velocity deltas while
    # locked (tracker.coast_accel_ema); while lost the coast extrapolates
    # with it, so curved trajectories (the occlusion clip's sine) don't
    # accumulate the constant-velocity error
    blend: jax.Array  # [] f32 running LIKELIHOOD head-blend (the automatic
    # blend policy, config model.head_blend_auto; -1 = unseeded — the first
    # step adopts the static model.head_blend). Gates always use the static
    # blend; only the particle posterior uses this one. Inert (-1 forever)
    # when the policy is off.


class TrackOutput(NamedTuple):
    position: jax.Array  # [2] (x, y) posterior-mean target center
    box: jax.Array  # [2] (w, h) estimated box size
    velocity: jax.Array  # [2] posterior-mean velocity
    conf: jax.Array  # [] max cosine similarity to template
    ess: jax.Array  # [] effective sample size
    resampled: jax.Array  # [] bool
    lost: jax.Array  # [] bool


def pack_track_output(out) -> jax.Array:
    """Flatten a TrackOutput pytree into ONE f32 vector (jit-traceable).

    Layout contract: tree_leaves order, each leaf raveled then concatenated
    — exactly what runtime/streaming.py's OutputPacker.pack produces, so a
    row packed on-device inside the step executable unpacks with the same
    OutputPacker. Packing INSIDE the step saves one host->device dispatch
    per streamed chunk, which matters on relay-attached devices where each
    dispatch costs ~ms of submission latency (see stream_track)."""
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(out)]
    )


def _pf_params(cfg: Config) -> PFParams:
    f = cfg.filter
    return PFParams(
        motion=MotionParams(
            sigma_pos=f.motion.sigma_pos,
            sigma_vel=f.motion.sigma_vel,
            sigma_scale=f.motion.sigma_scale,
            vel_decay=f.motion.vel_decay,
        ),
        ess_threshold=f.ess_threshold,
        init_sigma_pos=f.init_sigma_pos,
        init_sigma_vel=f.init_sigma_vel,
    )


def _window_side(box_wh: jax.Array, scale: jax.Array, search_scale: float) -> jax.Array:
    return search_scale * jnp.sqrt(box_wh[0] * box_wh[1]) * scale


def _float_view(v: FrameView) -> FrameView:
    return FrameView(v.pixels.astype(jnp.float32), v.origin, v.stride)


def _frame_views(frame) -> tuple[FrameView, FrameView]:
    """Normalize the step's frame input to (tracking view, global view).

    Raw [H, W, 3] frames become a shared full view (origin 0, stride 1 —
    folds to no-ops); a StreamFrame (ROI streaming, component B12) supplies
    a stride-1 ROI for the tracking path and a decimated whole-frame view
    for global re-detection / frame bounds.
    """
    if isinstance(frame, StreamFrame):
        return _float_view(frame.track), _float_view(frame.glob)
    v = full_view(frame.astype(jnp.float32))
    return v, v


def _frame_dims(gview: FrameView) -> tuple[int, int]:
    """Static full-frame (h, w) px implied by the global view (exact for
    stride-1; overestimates by < stride px for a decimated view)."""
    return (
        int(gview.pixels.shape[0] * gview.stride),
        int(gview.pixels.shape[1] * gview.stride),
    )


class _Fns(NamedTuple):
    init: Any
    step: Any
    track_clip: Any
    track_chunk: Any


def build_tracker_fns(cfg: Config, batch_hint: int = 1) -> _Fns:
    """Build (init_fn, step_fn, track_clip_fn), pure and jittable, closing
    over config statics only. ViT weights are an explicit first argument of
    every fn — NOT a closure constant — so they enter the compiled program
    as a runtime parameter (one H2D transfer, shardable, donation-friendly)
    instead of being baked into the HLO as hundreds of MB of literals (which
    bloats compile time and overflows this rig's remote-compile relay).

    batch_hint: outer-vmap width the caller will map these fns over (banked
    / multistream trackers) — feeds the flash-attention dispatch gate with
    the EXECUTED batch size (ops/attention.py).

    init(params, frame, bbox, seed) -> TrackerState
    step(params, state, frame) -> (TrackerState, TrackOutput)
    track_clip(params, state, frames) -> (TrackerState, TrackOutput[T])
    """
    spec = VitSpec.from_config(cfg.model)._replace(attn_batch_hint=batch_hint)
    pfp = _pf_params(cfg)
    n = cfg.filter.num_particles
    temp = cfg.filter.likelihood_temp
    zscale = cfg.filter.likelihood_zscale
    use_znorm = cfg.filter.likelihood == "zcos"
    lost_thresh = cfg.filter.lost_conf_threshold
    lost_ratio = cfg.filter.lost_conf_ratio
    relock_ratio = cfg.tracker.relock_conf_ratio
    t = cfg.tracker
    mode = t.mode
    s_img = cfg.model.image_size if mode == "dense" else t.crop_size
    patch = cfg.model.patch_size
    ema = t.template_ema
    upd_conf = t.template_update_conf
    anchor_mix = t.template_anchor_mix

    if mode == "crop":
        spec = spec._replace(image_size=t.crop_size)
    else:
        # Translation-equivariant features for ROI pooling (see VitSpec).
        spec = spec._replace(use_pos_embed=False)

    # ---- appearance embedding -------------------------------------------
    # The dense path lives in models/embedder.py so the feature trainer
    # (training/) differentiates through the EXACT inference code.
    dense_es = DenseEmbedSpec(
        vit=spec,
        s_img=s_img,
        patch=patch,
        appearance=t.appearance,
        roi_grid=t.roi_grid,
        center_features=t.center_features,
        head_blend=cfg.model.head_blend,
    )
    # Residual-head feature split (models/vit.py:VitSpec.head_depth): every
    # cosine below blends (1-b)*cos_trunk + b*cos_head, and template halves
    # normalize independently. None in headless configs — all paths are
    # then bit-identical to pre-head code.
    split = dense_es.split if mode == "dense" else None
    # Automatic likelihood-blend policy (config model.head_blend_auto): the
    # static head_blend keeps governing every DISCRIMINATION decision (conf
    # for the lost gate, the re-lock probe, global re-detection — all via
    # `split` above), while the particle LIKELIHOOD blend adapts per step
    # from the trunk landscape's confusion (ops/likelihood.py).
    m = cfg.model
    auto_blend = bool(m.head_blend_auto) and split is not None
    ab_init = float(min(max(m.head_blend, m.head_blend_min), m.head_blend_max))
    ab_min, ab_max = float(m.head_blend_min), float(m.head_blend_max)
    ab_lo, ab_hi = float(m.head_blend_spread_lo), float(m.head_blend_spread_hi)
    ab_ema = float(m.head_blend_ema)
    ab_top = float(m.head_blend_top_frac)

    def _norm_folded_embed_weights(prm):
        """Fold pixel normalization into the patch-embed affine map:
        ((x - m)/s) @ K = x @ (K / s_per_channel) - ((m/s) @ K), so crops can
        be sampled from the raw uint8-valued frame/window directly."""
        c = 3
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
        kern_f = prm["patch_embed"]["kernel"]  # [p*p*3, D] f32
        kern_scaled = (kern_f.reshape(-1, c, spec.dim) / std[None, :, None]).reshape(
            -1, spec.dim
        )
        bias_shift = jnp.einsum("pcd,c->d", kern_f.reshape(-1, c, spec.dim), mean / std)
        return (
            kern_scaled.astype(spec.dtype),
            (prm["patch_embed"]["bias"] - bias_shift).astype(spec.dtype),
        )

    def crop_embeddings(prm, view: FrameView, center, side, boxes_xy, boxes_wh):
        """Fused gather+patchify -> one batched ViT encoder call."""
        kern, bias = _norm_folded_embed_weights(prm)
        if t.crop_impl == "frame":
            # gather_patchify samples in the coordinates of its pixel
            # buffer; map the frame-coord hypotheses through the view.
            inv = 1.0 / float(view.stride)
            tokens = gather_patchify(
                view.pixels,
                (boxes_xy - view.origin) * inv,
                boxes_wh * inv,  # crop extent == hypothesis box
                t.crop_size,
                patch,
                kern,
                bias,
                region=t.crop_region,
            )
        else:
            # Two-stage: resample ONE search window (VMEM-scale at any frame
            # resolution), then sample all particle crops from it. The Pallas
            # kernel fuses sampling + patchify + embed (ops/patchify_pallas.py).
            swin = t.window_size
            window = view_extract_window_mxu(view, center, side, swin)
            ctr_win = frame_to_window_coords(boxes_xy, center, side, swin)
            wh_win = boxes_wh * (swin / side)
            if t.crop_impl == "window-pallas" and jax.default_backend() == "tpu":
                tokens = gather_patchify_window_pallas(
                    window, ctr_win, wh_win, t.crop_size, patch, kern, bias
                )
            else:
                tokens = window_gather_patchify_xla(
                    window, ctr_win, wh_win, t.crop_size, patch, kern, bias
                )
        feats = encode_tokens(prm, tokens, spec)
        return pool_tokens(feats, spec), jnp.ones(boxes_xy.shape[0], bool)

    def make_embedder(prm, view: FrameView, center, side):
        if mode == "dense":
            return make_dense_embedder(prm, view, center, side, dense_es)
        return lambda bxy, bwh: crop_embeddings(prm, view, center, side, bxy, bwh)

    # ---- init -------------------------------------------------------------
    def init_fn(prm, frame_u8: jax.Array, bbox: jax.Array, seed: jax.Array) -> TrackerState:
        """bbox: [4] (x, y, w, h) frame px; seed: int32 scalar (traced, so the
        banked tracker can vmap over per-bank seeds). Template + cloud init."""
        key = jax.random.key(seed)
        view = full_view(frame_u8.astype(jnp.float32))
        center = bbox[:2] + bbox[2:] / 2.0
        box_wh = bbox[2:]
        side = _window_side(box_wh, jnp.float32(1.0), t.search_scale)
        emb, _ = make_embedder(prm, view, center, side)(center[None], box_wh[None])
        template = l2_normalize_split(emb[0].astype(jnp.float32), split)
        pf = init_state(jax.random.fold_in(key, 0xFFFFFFFF), center, n, pfp)
        return TrackerState(
            pf=pf,
            template=template,
            anchor=template,
            box_wh=box_wh,
            center=center,
            prev_scale=jnp.float32(1.0),
            key=key,
            frame_idx=jnp.int32(0),
            conf=jnp.float32(1.0),
            lost=jnp.asarray(False),
            lost_count=jnp.int32(0),
            conf_ema=jnp.float32(-1.0),  # adopt the first measured conf
            coast_xy=center,
            coast_vel=jnp.zeros((2,), jnp.float32),
            coast_acc=jnp.zeros((2,), jnp.float32),
            blend=jnp.float32(-1.0),  # adopt the static blend on first step
        )

    # ---- step -------------------------------------------------------------
    def step_fn(prm, state: TrackerState, frame):
        """frame: raw [H, W, 3] array, or a StreamFrame (ROI streaming)."""
        view, gview = _frame_views(frame)
        noise = draw_step_noise(jax.random.fold_in(state.key, state.frame_idx), n)
        # Re-detection (SURVEY.md §5.3): while lost, sweep a wider area —
        # inflate position diffusion and the search window until re-lock.
        noise_boost = jnp.where(state.lost, t.redetect_noise_boost, 1.0)
        noise = noise._replace(pos=noise.pos * noise_boost)
        particles = propagate(state.pf.particles, noise, pfp.motion)

        side = _window_side(state.box_wh, state.prev_scale, t.search_scale)
        side = side * jnp.where(state.lost, t.redetect_window_boost, 1.0)
        boxes_xy = particles[:, 0:2]
        boxes_wh = state.box_wh[None, :] * jnp.exp(particles[:, 4:5])
        pool = make_embedder(prm, view, state.center, side)
        # Matching template: adaptive EMA blended with the immutable anchor
        # (bounds template drift; see config tracker.template_anchor_mix).
        if anchor_mix > 0.0 and ema > 0.0:
            tmpl = l2_normalize_split(
                anchor_mix * state.anchor + (1.0 - anchor_mix) * state.template,
                split,
            )
        else:
            tmpl = state.template
        b_run = state.blend  # passed through unchanged unless auto_blend
        b_tgt = state.blend
        if mode == "dense" and auto_blend:
            # Two blends from one scoring pass (models/embedder.py:
            # score_halves_from_feat): the LIKELIHOOD uses the running
            # adaptive blend (state.blend), the gates' confidence keeps the
            # static head_blend — so the measured lookalike-rejection gate
            # stack is untouched while localization leans on whichever
            # feature half currently resolves the scene.
            cos_f, cos_h, in_win = pool.score_halves(tmpl, boxes_xy, boxes_wh)
            b_run = jnp.where(state.blend >= 0.0, state.blend, jnp.float32(ab_init))
            d_static, b_static = split
            cos = (1.0 - b_static) * cos_f + b_static * cos_h
            # Confusion signal: softmax-weighted spatial spread of the TRUNK
            # landscape over the (in-window) particle cloud, in box-diagonal
            # units. The trunk half is the matched filter whose multimodality
            # (a lookalike inside the cloud) the head exists to resolve.
            spread = landscape_spread(cos_f, boxes_xy, ab_top, mask=in_win)
            box_diag = jnp.linalg.norm(state.box_wh) * state.prev_scale
            b_tgt = auto_blend_target(spread, box_diag, ab_lo, ab_hi, ab_min, ab_max)
            # FAST ATTACK, slow release: THIS step's likelihood already uses
            # the attacked blend max(b_run, b_tgt). Confusion is an emergency
            # — a lookalike entering the window must be taxed by the head the
            # same frame it lands in the cloud, or the transfer happens while
            # the EMA is still warming up (measured round 5: lookalikes
            # seed 0 locked an impostor at 81 px RMSE under the symmetric
            # EMA; the clip's other seeds and every other family were fine).
            # Release (b_tgt < b_run) stays EMA-smoothed so one quiet frame
            # mid-confusion can't drop the tax (see blend_next below).
            b_use = jnp.maximum(b_run, b_tgt)
            # While LOST the posterior is a SEARCH distribution, not a
            # localizer: the boosted exploration cloud is hunting for the
            # target among whatever the window contains, so discrimination
            # is everything and localization precision is moot. Weight it
            # with the gates' static blend instead of the frozen adaptive
            # one. Measured failure without this (round 5, lookalikes
            # seed 0): the clip occludes the target while an impostor
            # shadows it; the pre-occlusion scene is unimodal so the
            # adaptive blend sat at b_min when the lost gate fired, froze
            # there, and the b_min-weighted exploration posterior handed
            # the cloud to the impostor (81 px RMSE) — while the same
            # frames at the static 0.5 blend re-acquire the true target.
            b_use = jnp.where(state.lost, jnp.float32(b_static), b_use)
            cos_loc = (1.0 - b_use) * cos_f + b_use * cos_h
            if use_znorm:
                loglik = znormed_logits_from_cos(cos_loc, zscale, mask=in_win)
            else:
                loglik = temp * cos_loc
        elif mode == "dense":
            # Fused particle scoring: cosines straight from the token grid
            # without materializing per-particle embeddings — neither the
            # cells path's [N, K, K, D] nor the pooled path's [N, Gw*D]
            # intermediate reaches HBM (the pooling stage previously
            # out-weighed the ViT forward at high particle counts —
            # models/embedder.py:score_from_feat).
            cos, in_win = pool.score(tmpl, boxes_xy, boxes_wh)
            if use_znorm:
                # Masked stats: out-of-window particles' clamped-edge
                # cosines must not skew mu/sd (they do exactly when it
                # matters most — lost/re-detect with boosted noise).
                loglik = znormed_logits_from_cos(cos, zscale, mask=in_win)
            else:
                loglik = temp * cos
        else:
            emb, in_win = pool(boxes_xy, boxes_wh)
            if use_znorm:
                loglik, cos = znormed_log_likelihood(
                    emb, tmpl, zscale, mask=in_win, split=split
                )
            else:
                loglik, cos = cosine_log_likelihood(emb, tmpl, temp, split=split)
        loglik = jnp.where(in_win, loglik, loglik - 1e4)

        out = pf_update(particles, state.pf.log_weights, loglik, noise.resample_u, pfp)
        if t.estimate == "mode":
            # MAP-style point estimate: the highest-posterior-weight particle
            # (config tracker.estimate; "mean" is the default posterior mean).
            post_w = state.pf.log_weights + loglik
            est = particles[jnp.argmax(post_w)]
        else:
            est = out.estimate
        est_xy = est[0:2]
        est_scale = jnp.exp(est[4])
        # Confidence = best VALID cosine; out-of-window clamped-edge matches
        # must not fake a lock (all-out-of-window -> conf -1 -> lost).
        conf = jnp.max(jnp.where(in_win, cos, -1.0))
        # While lost the search window is boosted, which coarsens the
        # dense-mode feature resolution and depresses EVERY cosine — gating
        # re-lock on `conf` then self-locks the lost state (the level it
        # must re-cross was set at unboosted scale). Probe the current
        # estimate through an UNBOOSTED window instead: one extra encode,
        # inside the lost-only cond branch. During occlusion the probe sees
        # the occluder (stays lost); at reappearance it sees the target at
        # locked-state scale (clears).
        # Built only when lost detection is configured: under vmap (banked /
        # multistream) lax.cond lowers to a select that executes BOTH
        # branches every step — an unconditional second window encode that
        # cost eval4 ~35% fps before this static gate.
        if mode == "dense" and (lost_thresh > 0.0 or lost_ratio > 0.0):
            def _probe(_):
                side0 = _window_side(state.box_wh, state.prev_scale, t.search_scale)
                pool_p = make_embedder(prm, view, est_xy, side0)
                emb_p, ok_p = pool_p(
                    est_xy[None], (state.box_wh * est_scale)[None]
                )
                _, cos_p = cosine_log_likelihood(emb_p, tmpl, 1.0, split=split)
                return jnp.where(ok_p[0], cos_p[0], jnp.float32(-1.0))

            conf_gate = jax.lax.cond(
                state.lost, _probe, lambda _: conf, None
            )
        else:
            conf_gate = conf  # crop mode embeds at native box scale already
        lost = conf_gate < lost_thresh
        # Relative gate (filter.lost_conf_ratio): compare against the
        # running locked-state confidence EMA instead of an absolute
        # cosine — transfers across feature sets (random vs trained shift
        # the whole cosine distribution). The EMA only adapts while
        # locked, so a slow occlusion can't drag the baseline down with it.
        unseeded = state.conf_ema < 0.0
        conf_base = jnp.where(unseeded, conf_gate, state.conf_ema)
        if lost_ratio > 0.0:
            lost = lost | (conf_gate < lost_ratio * conf_base)
        if relock_ratio > 0.0:
            # Hysteresis (tracker.relock_conf_ratio): a lost tracker only
            # re-locks through confidence when the unboosted probe clears a
            # STRICTER bar than the one that keeps a lock. Otherwise the
            # first in-window object above the loose lost gate — e.g. a
            # lookalike impostor the boosted cloud drifted onto — becomes
            # the new lock with no appearance scrutiny at all. Global
            # re-detection acceptance below still clears the flag on its
            # own (ratio+z gated) terms.
            lost = lost | (state.lost & (conf_gate < relock_ratio * conf_base))
        # Adopt the first NON-lost confidence as the baseline; while lost the
        # EMA is frozen (and stays at the -1 sentinel if never yet locked),
        # so a start-of-track occlusion can't seed a depressed baseline that
        # would leave the relative gate under-sensitive forever after.
        conf_ema_new = jnp.where(
            lost,
            jnp.where(unseeded, state.conf_ema, conf_base),
            0.9 * conf_base + 0.1 * conf_gate,
        )

        # Template EMA update at the estimated box (B8 robustness), gated on
        # confidence so occlusions don't poison the template.
        if ema > 0.0:
            est_emb, _ = pool(est_xy[None], (state.box_wh * est_scale)[None])
            cand = l2_normalize_split(
                (1.0 - ema) * state.template
                + ema * l2_normalize_split(est_emb[0].astype(jnp.float32), split),
                split,
            )
            # ~state.lost: on a re-lock frame est_emb came from the still-
            # boosted window (scale-mismatched features) — skip one update.
            do_upd = (conf > upd_conf) & ~lost & ~state.lost
            template = jnp.where(do_upd, cand, state.template)
        else:
            template = state.template

        # When lost, freeze the search window instead of chasing noise.
        new_center = jnp.where(lost, state.center, est_xy)
        lost_count = jnp.where(lost, state.lost_count + 1, jnp.int32(0))
        new_pf = out.state

        # ---- GLOBAL re-detection (SURVEY.md §5.3) --------------------------
        # The local boost above only widens the (frozen) window; a target
        # that left it entirely during occlusion is unrecoverable locally.
        # After `redetect_global_after` consecutive lost frames, score a
        # coarse grid of candidate boxes over the WHOLE frame against the
        # anchored template and re-seed the cloud at the best match. The
        # extra ViT forward lives in a lax.cond branch, so it executes only
        # on the lost path (HLO conditional; under vmap it becomes a select
        # and is paid every step — see config.py redetect_global_after).
        n_after = t.redetect_global_after
        if n_after > 0:
            g = t.redetect_global_grid
            c_sub = 3  # candidate sub-grid per tile (dense tiled scan)
            h_px, w_px = _frame_dims(gview)
            gxs = (jnp.arange(g, dtype=jnp.float32) + 0.5) * (w_px / g)
            gys = (jnp.arange(g, dtype=jnp.float32) + 0.5) * (h_px / g)
            tile_ctrs = jnp.stack(
                [jnp.tile(gxs, g), jnp.repeat(gys, g)], axis=-1
            )  # [G*G, 2] row-major over the frame
            frame_ctr = jnp.asarray([w_px / 2.0, h_px / 2.0], jnp.float32)
            frame_side = jnp.float32(max(h_px, w_px))
            trigger = lost_count >= n_after
            cand_wh = state.box_wh * state.prev_scale

            def scan_fn(_):
                if mode == "dense":
                    # Tiled scan: G*G windows at near-local-search scale
                    # (one BATCHED ViT forward), C*C candidate boxes per
                    # tile — candidates are scored at the resolution the
                    # appearance model operates at, not squeezed through a
                    # single whole-frame window (models/embedder.py:
                    # tiled_window_embed).
                    tile_side = jnp.maximum(1.25 * frame_side / g, side)
                    oxs = (jnp.arange(c_sub, dtype=jnp.float32) - (c_sub - 1) / 2) * (
                        w_px / (g * c_sub)
                    )
                    oys = (jnp.arange(c_sub, dtype=jnp.float32) - (c_sub - 1) / 2) * (
                        h_px / (g * c_sub)
                    )
                    offs = jnp.stack(
                        [jnp.tile(oxs, c_sub), jnp.repeat(oys, c_sub)], axis=-1
                    )  # [C*C, 2]
                    cand = tile_ctrs[:, None, :] + offs[None, :, :]  # [G2, C2, 2]
                    emb_g, valid_g = tiled_window_embed(
                        prm, gview, tile_ctrs, tile_side, dense_es, cand, cand_wh
                    )
                    emb_g = emb_g.reshape(g * g * c_sub * c_sub, *emb_g.shape[2:])
                    valid_g = valid_g.reshape(-1)
                    cand_flat = cand.reshape(-1, 2)
                else:
                    # Crop mode embeds each candidate at native crop
                    # resolution already; a single flat grid suffices.
                    pool_g = make_embedder(prm, gview, frame_ctr, frame_side)
                    cand_flat = tile_ctrs
                    emb_g, valid_g = pool_g(
                        cand_flat, jnp.broadcast_to(cand_wh, cand_flat.shape)
                    )
                _, cos_g = cosine_log_likelihood(emb_g, tmpl, 1.0, split=split)
                cos_g = jnp.where(valid_g, cos_g, -2.0)
                b = jnp.argmax(cos_g)
                # Feature-agnostic acceptance margin: how far the winner
                # sits above the candidate population (absolute cosine
                # thresholds are feature-distribution dependent — trained
                # features shift the whole distribution).
                nv = jnp.maximum(jnp.sum(valid_g), 1)
                mu = jnp.sum(jnp.where(valid_g, cos_g, 0.0)) / nv
                var = jnp.sum(jnp.where(valid_g, (cos_g - mu) ** 2, 0.0)) / nv
                z = (cos_g[b] - mu) * jax.lax.rsqrt(var + 1e-8)
                return cand_flat[b], cos_g[b], z

            best_xy, best_cos, best_z = jax.lax.cond(
                trigger,
                scan_fn,
                lambda _: (state.center, jnp.float32(-2.0), jnp.float32(0.0)),
                None,
            )
            accept = (
                trigger
                & (best_cos >= t.redetect_accept_conf)
                & (best_z >= t.redetect_accept_z)
            )
            if t.redetect_accept_ratio > 0:
                # Feature-agnostic absolute-level gate: fraction of the
                # locked-state confidence EMA (the lost gate's reference),
                # skipped while unseeded. See config.redetect_accept_ratio.
                accept = accept & (
                    (state.conf_ema <= 0)
                    | (best_cos >= t.redetect_accept_ratio * state.conf_ema)
                )
            # Re-seed: fresh cloud spread over the winning grid cell, zero
            # velocity, uniform weights. Distinct RNG stream from the step
            # noise: split(k, n)[i] == fold_in(k, i) in threefry, so the fold
            # constant must sit far outside draw_step_noise's split range.
            rk = jax.random.fold_in(
                jax.random.fold_in(state.key, state.frame_idx), 0x5EED1
            )
            cell_sigma = jnp.asarray([w_px / g, h_px / g], jnp.float32) / 4.0
            reseed_pos = best_xy[None, :] + cell_sigma * jax.random.normal(
                rk, (n, 2), jnp.float32
            )
            reseeded = jnp.concatenate(
                [reseed_pos, jnp.zeros((n, 2), jnp.float32), new_pf.particles[:, 4:]],
                axis=1,
            )
            uniform_w = jnp.full((n,), -jnp.log(jnp.float32(n)), jnp.float32)
            new_pf = PFState(
                particles=jnp.where(accept, reseeded, new_pf.particles),
                log_weights=jnp.where(accept, uniform_w, new_pf.log_weights),
            )
            new_center = jnp.where(accept, best_xy, new_center)
            lost_count = jnp.where(accept, jnp.int32(0), lost_count)
            # A confident global match IS the re-acquisition: clear lost so
            # the next step runs unboosted around the re-seeded cloud.
            # Waiting for conf to re-cross lost_thresh instead never
            # converges — the boosted window shifts the whole cosine
            # distribution down, and repeated re-seeds (each resetting the
            # cloud) wobble the estimate indefinitely. If the match was
            # wrong, conf stays low and lost re-fires one frame later.
            # EXCEPT under re-lock hysteresis (tracker.relock_conf_ratio):
            # scan-tile cosines are not on the probe's scale (different
            # window content shifts the window-mean centering — measured
            # 0.68 for an impostor the probe scores at 0.42), so during an
            # occlusion the scan's EMA-ratio gate cannot reject a lookalike
            # that is the only template-like object in frame. Acceptance
            # then still re-seeds the cloud and re-aims the window, but the
            # flag clears only when the NEXT step's unboosted probe at the
            # re-seeded estimate clears relock_conf_ratio * conf_ema — a
            # wrong re-seed keeps scanning (lost_count was reset, so the
            # scan re-arms) and snaps to the true target once visible.
            scale_frozen = lost  # prev_scale: pre-reseed estimate is stale
            if relock_ratio > 0.0:
                pass  # hysteresis owns ALL re-locks (see above)
            else:
                lost = lost & ~accept
            accepted = accept
            accept_xy = best_xy
        else:
            scale_frozen = lost
            accepted = jnp.asarray(False)
            accept_xy = est_xy

        # Lost-aware output: while lost, the REPORTED trajectory coasts on
        # the last-locked position advanced by the last-locked velocity
        # (clamped to the frame), instead of the posterior mean — which
        # chases the boosted exploration noise during occlusion. On a
        # global re-detect accept the output snaps to the accepted match
        # (the pre-reseed posterior mean is stale). Filter state (cloud,
        # window center) is untouched; only the emitted record coasts.
        fh, fw = _frame_dims(gview)
        frame_max = jnp.asarray([fw - 1, fh - 1], jnp.float32)
        est_vel = est[2:4]
        est_out = jnp.where(accepted, accept_xy, est_xy)
        # Coast acceleration: EMA of the locked per-frame velocity delta
        # (tracker.coast_accel_ema; 0 disables -> pure constant-velocity
        # coast). A curved trajectory (the occlusion clip's sine) changes
        # velocity while hidden — extrapolating with the pre-loss
        # acceleration roughly halves the mid-occlusion error. Clipped per
        # axis (coast_accel_clip) so a noisy posterior can't launch the
        # coast; frozen while lost; reset on a global re-detect accept.
        a_ema = jnp.float32(t.coast_accel_ema)
        acc_upd = jnp.clip(
            (1.0 - a_ema) * state.coast_acc + a_ema * (est_vel - state.coast_vel),
            -t.coast_accel_clip,
            t.coast_accel_clip,
        )
        coast_acc = jnp.where(
            lost, state.coast_acc,
            jnp.where(accepted, jnp.zeros_like(est_vel), acc_upd),
        )
        vel_lost = state.coast_vel + state.coast_acc  # semi-implicit Euler
        coast_xy = jnp.where(
            lost,
            jnp.clip(state.coast_xy + vel_lost, 0.0, frame_max),
            est_out,
        )
        coast_vel = jnp.where(
            lost, vel_lost,
            jnp.where(accepted, jnp.zeros_like(est_vel), est_vel),
        )
        if auto_blend:
            # Asymmetric update toward the measured target, frozen while
            # lost (the boosted exploration noise inflates the spread for
            # reasons that aren't appearance confusion, and the gates
            # (static blend) own the lost path anyway). Attack is instant —
            # max(EMA, b_tgt) jumps straight to b_tgt when confusion rises,
            # matching the b_use this step's likelihood already applied —
            # while release rides the EMA down.
            blend_next = jnp.where(
                lost,
                b_run,
                jnp.maximum((1.0 - ab_ema) * b_run + ab_ema * b_tgt, b_tgt),
            )
        else:
            blend_next = state.blend
        new_state = TrackerState(
            pf=new_pf,
            template=template,
            anchor=state.anchor,
            box_wh=state.box_wh,
            center=new_center,
            prev_scale=jnp.where(scale_frozen, state.prev_scale, est_scale),
            key=state.key,
            frame_idx=state.frame_idx + 1,
            conf=conf_gate,
            lost=lost,
            lost_count=lost_count,
            conf_ema=conf_ema_new,
            coast_xy=coast_xy,
            coast_vel=coast_vel,
            coast_acc=coast_acc,
            blend=blend_next,
        )
        track_out = TrackOutput(
            # coast_xy already selects est_out on the non-lost branch.
            position=coast_xy,
            box=state.box_wh * jnp.where(lost, state.prev_scale, est_scale),
            velocity=coast_vel,
            conf=conf_gate,
            ess=out.ess,
            resampled=out.resampled,
            lost=lost,
        )
        return new_state, track_out

    # ---- whole-clip step (offline/batch path) ------------------------------
    def track_clip_fn(prm, state: TrackerState, frames_u8: jax.Array):
        """lax.scan of step_fn over a staged clip [K, H, W, 3].

        ONE device dispatch tracks K frames — the offline/batch API, and the
        purest per-chip throughput unit (no host round-trips between frames).
        Semantically identical to K sequential step() calls (same RNG
        counters), which tests assert.
        """
        return jax.lax.scan(lambda s, f: step_fn(prm, s, f), state, frames_u8)

    # ---- chunked ROI step (streaming path, component B12) ------------------
    def track_chunk_fn(prm, state: TrackerState, chunk: StreamFrame):
        """lax.scan of step_fn over C stacked ROI views sharing one global
        view: chunk.track is a FrameView with leading-C pixels [C, h, w, 3]
        and origins [C, 2]; chunk.glob is ONE decimated whole-frame view.

        This is what amortizes the streaming pipeline's per-dispatch cost
        (host->device submission latency) over C frames: one H2D of the
        stacked crops + one dispatch tracks C frames. Semantically identical
        to C sequential step() calls on the individual StreamFrames (same
        RNG counters) — tests assert this.
        """
        tv, gv = chunk.track, chunk.glob

        def body(s, xs):
            px, org = xs
            sf = StreamFrame(track=FrameView(px, org, tv.stride), glob=gv)
            return step_fn(prm, s, sf)

        # runtime.stream_chunk_unroll: the chunk length is small and static,
        # so the scan can be fully unrolled — no outer `while` in the chunk
        # executable, at a chunk-times-larger program.
        unroll = True if cfg.runtime.stream_chunk_unroll else 1
        return jax.lax.scan(body, state, (tv.pixels, tv.origin), unroll=unroll)

    return _Fns(
        init=init_fn,
        step=step_fn,
        track_clip=track_clip_fn,
        track_chunk=track_chunk_fn,
    )


# ---------------------------------------------------------------------------
# State checkpoint/resume (SURVEY.md §5.4): TrackerState is a flat pytree of
# arrays, so a stream can be checkpointed mid-video and resumed exactly —
# the RNG is counter-based (key + frame_idx), so the resumed trajectory is
# bitwise-identical to the uninterrupted one.
# ---------------------------------------------------------------------------

# State-checkpoint format. v1 = name-keyed entries ("pf/particles", ...,
# "conf") — robust to field reordering, and fields added in later versions
# load with explicit defaults instead of silently shifting into the wrong
# leaves (round-1 VERDICT weak #4). Files without the marker are the round-1
# positional leaf_<i> layout, still loadable below.
STATE_FORMAT_VERSION = 1
_STATE_FORMAT_KEY = "__vpt_state_format__"


def _named_state_leaves(state: TrackerState) -> dict[str, Any]:
    """Flatten nested NamedTuples to {"pf/particles": arr, ...}."""
    def rec(node, prefix):
        if hasattr(node, "_asdict"):
            for k, v in node._asdict().items():
                yield from rec(v, f"{prefix}{k}/")
        else:
            yield prefix[:-1], node

    return dict(rec(state, ""))


def save_tracker_state(path: str, state: TrackerState) -> None:
    """Serialize a (possibly banked) TrackerState to a name-keyed .npz."""
    raw = state._replace(key=jax.random.key_data(state.key))
    flat = {k: np.asarray(v) for k, v in _named_state_leaves(raw).items()}
    flat[_STATE_FORMAT_KEY] = np.asarray(STATE_FORMAT_VERSION)
    np.savez(path, **flat)


def load_tracker_state(path: str) -> TrackerState:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    if _STATE_FORMAT_KEY in flat:
        version = int(flat.pop(_STATE_FORMAT_KEY))
        if version > STATE_FORMAT_VERSION:
            raise ValueError(
                f"{path}: state format v{version}, this build reads up to "
                f"v{STATE_FORMAT_VERSION}"
            )
        state = _state_from_named(flat, path)
    else:
        state = _state_from_positional(flat, path)
    return state._replace(key=jax.random.wrap_key_data(state.key))


def _state_from_named(flat: dict, path: str) -> TrackerState:
    def get(name, default=None):
        if name in flat:
            return jnp.asarray(flat[name])
        if default is not None:
            return jnp.asarray(default)
        raise ValueError(f"{path}: missing state entry '{name}'")

    # Defaults exist only for fields that ADDED semantics after the field
    # they derive from (forward compatibility for older v1 files).
    return TrackerState(
        pf=PFState(particles=get("pf/particles"), log_weights=get("pf/log_weights")),
        template=get("template"),
        anchor=get("anchor", flat.get("template")),
        box_wh=get("box_wh"),
        center=get("center"),
        prev_scale=get("prev_scale"),
        key=get("key"),
        frame_idx=get("frame_idx"),
        conf=get("conf"),
        lost=get("lost"),
        # Added after v1 shipped: files without it resume with a fresh count
        # (shape-matched to frame_idx so banked states keep their bank axis).
        lost_count=get("lost_count", np.zeros_like(flat["frame_idx"], np.int32)),
        # Added with filter.lost_conf_ratio: older files re-adopt the first
        # measured confidence (-1 sentinel), matching a fresh init.
        conf_ema=get("conf_ema", np.full_like(np.asarray(flat["conf"], np.float32), -1.0)),
        # Added with lost-aware output coasting: older files resume coasting
        # from the saved window center with zero velocity.
        coast_xy=get("coast_xy", np.asarray(flat["center"], np.float32)),
        coast_vel=get("coast_vel", np.zeros_like(np.asarray(flat["center"], np.float32))),
        # Added with accel-aware coasting: older files resume with zero
        # acceleration (= the constant-velocity coast they were saved under).
        coast_acc=get("coast_acc", np.zeros_like(np.asarray(flat["center"], np.float32))),
        # Added with the automatic head-blend policy: older files resume
        # unseeded (-1 = adopt the static model.head_blend on the next step).
        blend=get("blend", np.full_like(np.asarray(flat["conf"], np.float32), -1.0)),
    )


def _state_from_positional(flat: dict, path: str) -> TrackerState:
    """Round-1 layout: leaf_<i> in TrackerState field order."""
    try:
        leaves = [jnp.asarray(flat[f"leaf_{i}"]) for i in range(len(flat))]
    except KeyError:
        raise ValueError(f"{path}: not a TrackerState checkpoint") from None
    names = [
        "pf/particles", "pf/log_weights", "template", "anchor", "box_wh",
        "center", "prev_scale", "key", "frame_idx", "conf", "lost",
    ]
    if len(leaves) == len(names) - 1:
        # Pre-anchor round-1 file: anchor := template.
        leaves.insert(3, leaves[2])
    if len(leaves) != len(names):
        raise ValueError(
            f"{path}: {len(leaves)} leaves, expected {len(names)} — not a "
            "TrackerState checkpoint (or from an incompatible version)"
        )
    return _state_from_named(dict(zip(names, leaves)), path)


class Tracker:
    """User-facing API: Tracker(cfg).init(frame, bbox); .step(frame); .run(src).

    Mirrors the reference's usage contract (README.md:37,42): construct from
    a config, feed frames, receive per-frame positions in real time.
    """

    def __init__(self, cfg: Config, vit_params=None, mesh=None):
        cfg.resolve()
        self.cfg = cfg
        spec = VitSpec.from_config(cfg.model)
        if cfg.tracker.mode == "crop":
            spec = spec._replace(image_size=cfg.tracker.crop_size)
        self.spec = spec
        from vitparticlefiltertracker_tpu.models.params import resolve_vit_params

        vit_params = resolve_vit_params(cfg, vit_params)
        fns = build_tracker_fns(cfg)
        # runtime.donate_state=false keeps the previous TrackerState buffers
        # alive after each step (debugging / state snapshots at a copy cost).
        don = (1,) if cfg.runtime.donate_state else ()

        # runtime.mesh_particles/_model shard the single-object tracker
        # across chips: particle axis over "particle", ViT tensor-parallel
        # over "model" (parallel/mesh.py). mesh_banks belongs to the banked
        # tracker (runtime.banks > 1 -> MultiTracker).
        r = cfg.runtime
        if mesh is None and r.mesh_particles * r.mesh_model > 1:
            if r.mesh_banks > 1:
                raise ValueError(
                    "runtime.mesh_banks > 1 requires runtime.banks > 1 "
                    "(the banked MultiTracker)"
                )
            from vitparticlefiltertracker_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(1, r.mesh_particles, r.mesh_model)
        self.mesh = mesh
        if mesh is not None:
            from vitparticlefiltertracker_tpu.parallel.mesh import (
                check_tp_divisibility,
                vit_param_sharding,
            )

            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                check_tp_divisibility(
                    cfg.model.heads, cfg.model.mlp_dim, mesh.shape["model"]
                )
            self._param_sh = vit_param_sharding(mesh, vit_params)
            self.vit_params = jax.device_put(vit_params, self._param_sh)
            self._init_jit = jax.jit(fns.init)
            self._step_jit = None  # built lazily once state sharding is known
            self._clip_jit = None
            self._chunk_jit = None
        else:
            # Weights live on device as jit ARGUMENTS (one H2D), never as
            # closure constants baked into the HLO (see build_tracker_fns).
            self.vit_params = jax.device_put(vit_params)
            self._init_jit = jax.jit(fns.init)
            self._step_jit = jax.jit(fns.step, donate_argnums=don)
            self._clip_jit = jax.jit(fns.track_clip, donate_argnums=don)
            self._chunk_jit = jax.jit(fns.track_chunk, donate_argnums=don)
        self._fns = fns
        self._don = don
        self._state_sh = None  # mesh mode: set by _adopt_state
        self._rep = None
        self._step_packed_jit = None  # built lazily on first packed step
        self._chunk_packed_jit = None
        self.state: TrackerState | None = None

    # -- lifecycle -----------------------------------------------------------
    def init(self, frame: np.ndarray, bbox) -> None:
        bbox = jnp.asarray(np.asarray(bbox, np.float32))
        seed = jnp.int32(self.cfg.filter.seed)
        state = self._init_jit(self.vit_params, jnp.asarray(frame), bbox, seed)
        self._adopt_state(state)

    def _adopt_state(self, state: TrackerState) -> None:
        """Install a fresh/restored state; in mesh mode, lay it out on the
        mesh and (once) build the sharded step/clip executables pinned to
        that layout so donation stays in-place."""
        if self.mesh is not None:
            from vitparticlefiltertracker_tpu.parallel.mesh import (
                replicated,
                tracker_state_sharding,
            )

            shardings = tracker_state_sharding(self.mesh, state)
            state = jax.device_put(state, shardings)
            self._state_sh = shardings
            self._rep = replicated(self.mesh)
            if self._step_jit is None:
                rep = self._rep
                self._step_jit = jax.jit(
                    self._fns.step,
                    in_shardings=(self._param_sh, shardings, rep),
                    out_shardings=(shardings, None),
                    donate_argnums=self._don,
                )
                self._clip_jit = jax.jit(
                    self._fns.track_clip,
                    in_shardings=(self._param_sh, shardings, rep),
                    out_shardings=(shardings, None),
                    donate_argnums=self._don,
                )
                self._chunk_jit = jax.jit(
                    self._fns.track_chunk,
                    in_shardings=(self._param_sh, shardings, rep),
                    out_shardings=(shardings, None),
                    donate_argnums=self._don,
                )
        self.state = state

    def step(self, frame: np.ndarray) -> dict[str, Any]:
        """Track one frame; returns a host-side record (the one D2H)."""
        assert self.state is not None, "call init() first"
        t0 = time.perf_counter()
        self.state, out = self._step_jit(self.vit_params, self.state, jnp.asarray(frame))
        rec = self._to_record(out)
        rec["step_ms"] = (time.perf_counter() - t0) * 1e3
        return rec

    def step_device(self, frame_dev: jax.Array) -> TrackOutput:
        """Device-native step: no host sync (for streaming/bench loops)."""
        self.state, out = self._step_jit(self.vit_params, self.state, frame_dev)
        return out

    def step_chunk_device(self, chunk: StreamFrame) -> TrackOutput:
        """Track C ROI frames in ONE dispatch (streaming fast path).

        chunk.track: FrameView with stacked pixels [C, h, w, 3] and origins
        [C, 2]; chunk.glob: one shared decimated whole-frame view. Returns
        TrackOutput with a leading C axis. See _Fns.track_chunk."""
        assert self.state is not None, "call init() first"
        self.state, outs = self._chunk_jit(self.vit_params, self.state, chunk)
        return outs

    def _packed_jit(self, raw_fn):
        """Jit `raw_fn` with the output flattened on-device (pack_track_output)
        — track + pack in ONE executable, so the streaming pipeline pays one
        dispatch per step/chunk instead of two (step, then a separate pack)."""

        def fn(prm, state, frame):
            st, out = raw_fn(prm, state, frame)
            return st, pack_track_output(out)

        if self.mesh is not None:
            return jax.jit(
                fn,
                in_shardings=(self._param_sh, self._state_sh, self._rep),
                out_shardings=(self._state_sh, None),
                donate_argnums=self._don,
            )
        return jax.jit(fn, donate_argnums=self._don)

    def step_packed(self, frame_dev) -> jax.Array:
        """step_device with the TrackOutput packed on-device into one flat
        f32 row (OutputPacker layout). One dispatch, one readback handle."""
        assert self.state is not None, "call init() first"
        if self._step_packed_jit is None:
            self._step_packed_jit = self._packed_jit(self._fns.step)
        self.state, packed = self._step_packed_jit(
            self.vit_params, self.state, frame_dev
        )
        return packed

    def step_chunk_packed(self, chunk: StreamFrame) -> jax.Array:
        """step_chunk_device with the C-frame TrackOutput packed on-device
        into one flat f32 row. One dispatch per chunk."""
        assert self.state is not None, "call init() first"
        if self._chunk_packed_jit is None:
            self._chunk_packed_jit = self._packed_jit(self._fns.track_chunk)
        self.state, packed = self._chunk_packed_jit(
            self.vit_params, self.state, chunk
        )
        return packed

    def track_clip_device(self, frames_dev: jax.Array) -> TrackOutput:
        """Track a staged clip [K, H, W, 3] in ONE device call (lax.scan).

        Returns stacked TrackOutput with a leading K axis. The offline/batch
        API: K frames, one dispatch, one readback."""
        assert self.state is not None, "call init() first"
        self.state, outs = self._clip_jit(self.vit_params, self.state, frames_dev)
        return outs

    # -- checkpoint/resume (SURVEY.md §5.4) ----------------------------------
    def save(self, path: str) -> None:
        assert self.state is not None, "nothing to save before init()"
        save_tracker_state(path, self.state)

    def resume(self, path: str) -> None:
        """Restore mid-stream state; subsequent steps continue the exact
        trajectory the checkpointed run would have produced."""
        self._adopt_state(load_tracker_state(path))

    @staticmethod
    def _to_record(out: TrackOutput) -> dict[str, Any]:
        pos = np.asarray(out.position)
        box = np.asarray(out.box)
        return {
            "position": [float(pos[0]), float(pos[1])],
            "box": [float(box[0]), float(box[1])],
            "velocity": np.asarray(out.velocity).tolist(),
            "conf": float(out.conf),
            "ess": float(out.ess),
            "resampled": bool(out.resampled),
            "lost": bool(out.lost),
        }

    def run(self, source, sink=None, init_bbox=None):
        """Track a whole source; yields per-frame records (README.md:42)."""
        it = iter(source)
        frame0 = next(it)
        bbox = init_bbox
        if bbox is None:
            bbox = getattr(source, "init_bbox", None)
        if bbox is None:
            bbox = self.cfg.io.init_bbox
        self.init(frame0, bbox)
        for i, frame in enumerate(it):
            rec = self.step(frame)
            rec["frame"] = i + 1
            if sink is not None:
                sink.write(rec)
            yield rec
