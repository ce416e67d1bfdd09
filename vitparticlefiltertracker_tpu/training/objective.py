"""Localization InfoNCE: teach the dense embedder to rank the true box first.

For each scene pair, the template is pooled from frame0 at the (jittered)
true box — exactly how Tracker.init builds it — and scored against M
candidate boxes in frame1: the true box, a ring of hard offset negatives,
and random window boxes. Softmax cross-entropy with the true box as label 0
directly maximizes what the particle filter consumes: cosine-to-template
peaking at the right hypothesis and falling off elsewhere.

The embedding path is models/embedder.py — the inference code — so there is
no train/serve skew: window extraction, ROI cells, window-mean centering and
per-cell L2 normalization are all differentiated through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.models.embedder import (
    DenseEmbedSpec,
    make_dense_embedder,
)
from vitparticlefiltertracker_tpu.ops.likelihood import (
    _cos_to_template,
    l2_normalize_split,
)


def ring_offsets() -> jnp.ndarray:
    """Hard-negative offsets in units of the box size: 8 directions x 5
    radii. Overlapping-box radii (0.3, 0.55: ~50%/~30% IoU) are what make
    the cosine peak in position, i.e. localization precision (the round-2
    v1 checkpoint trained without them ranked candidates at 0.97 acc yet
    tracked ~2x worse than random init: its peaks were flat). Radius 0.3
    targets the scale the posterior mean actually forms at — the particle
    cloud spreads only a few px, and a profile that is flat there tracks
    noisily no matter how well it ranks distant boxes. Radius 1.0 =
    adjacent non-overlapping box."""
    ang = jnp.arange(8, dtype=jnp.float32) * (2 * jnp.pi / 8)
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # [8, 2]
    radii = jnp.asarray([0.3, 0.55, 1.0, 1.75, 3.0], jnp.float32)
    return (radii[:, None, None] * dirs[None]).reshape(-1, 2)  # [40, 2]


def pair_loss(
    prm: dict,
    es: DenseEmbedSpec,
    frame0: jax.Array,  # [S, S, 3] f32 0..255
    frame1: jax.Array,
    p0: jax.Array,  # [2] true center in frame0
    p1: jax.Array,  # [2] true center in frame1
    wh: jax.Array,  # [2] box size
    d1: jax.Array,  # [2] distractor center in frame1 (hard negative)
    look_on: jax.Array,  # [] 1.0 when the distractor is a lookalike clone
    frame2: jax.Array,  # [S, S, 3] frame1 WITHOUT the target (occluded ctx)
    key: jax.Array,
    *,
    tau: float,
    search_scale: float,
    num_random: int,
    template_jitter: float,
    cloud_weight: float = 0.0,
    cloud_particles: int = 64,
    cloud_sigma: float = 8.0,
    cloud_zscale: float = 9.0,
    distractor_margin: float = 0.0,
    distractor_weight: float = 0.0,
    distractor_centered_weight: float = 0.0,
    distractor_absent_weight: float = 0.0,
) -> tuple[jax.Array, dict]:
    """One sample's InfoNCE loss + metrics; vmapped over the batch."""
    k_jit, k_rand, k_cloud = jax.random.split(key, 3)
    # Window side exactly as the tracker computes it (runtime/tracker.py:
    # _window_side), floored so small targets still see their motion range.
    side = jnp.maximum(
        search_scale * jnp.sqrt(wh[0] * wh[1]), jnp.float32(64.0)
    )

    # Template from frame0 at the true box, jittered to mimic the imperfect
    # estimates the tracker feeds its template EMA.
    t_xy = p0 + template_jitter * wh * jax.random.normal(k_jit, (2,))
    pool0 = make_dense_embedder(prm, frame0, p0, side, es, remat=True)
    emb0, _ = pool0(t_xy[None], wh[None])
    # es.split: residual-head features — template halves normalize
    # independently and every cosine below is the blended split score, so
    # the loss shapes EXACTLY what the tracker consumes (no train/serve
    # skew). With a frozen trunk, gradients flow only through the head term.
    tmpl = l2_normalize_split(emb0[0].astype(jnp.float32), es.split)

    # Candidates in frame1. The window is centered on p0 — the "previous
    # estimate" — exactly the tracker's step geometry.
    offs = ring_offsets() * wh[None, :]
    rand = p0[None, :] + side * jax.random.uniform(
        k_rand, (num_random, 2), minval=-0.4, maxval=0.4
    )
    # Closed-loop cloud candidates (see below): a particle-filter-like cloud
    # around the truth, scored in the same embedder call.
    n_cloud = cloud_particles if cloud_weight > 0.0 else 0
    cloud = p1[None, :] + cloud_sigma * jax.random.normal(k_cloud, (n_cloud, 2))
    # The scene's distractor box is an EXPLICIT ranked negative: for
    # lookalike samples (training/data.py look_on) it shares the target's
    # colors/size inside the search window, so beating it requires pattern
    # -level discrimination — the object-recognition capability the
    # `lookalikes` eval clip measures. Out-of-window distractors are
    # masked by `valid` like any candidate.
    # Clone-ring boxes: the overlapping-radii offsets (0.3, 0.55 x 8 dirs)
    # placed ON the distractor. The filter consumes the cosine LANDSCAPE,
    # so suppressing only the exact clone box leaves its slightly-offset
    # neighbours peaking high (run-A round 3: training-set clone cosine
    # 0.15, eval tracker still locked the impostor).
    n_dring = 16
    d_ring = d1[None, :] + offs[:n_dring]
    cand = jnp.concatenate(
        [p1[None], p1[None] + offs, rand, d1[None], d_ring, cloud], axis=0
    )  # [M, 2]
    pool1 = make_dense_embedder(prm, frame1, p0, side, es, remat=True)
    emb1, valid = pool1(cand, jnp.broadcast_to(wh, cand.shape))
    cos = _cos_to_template(emb1, tmpl, es.split)  # [M]
    n_rank = 1 + offs.shape[0] + num_random + 1
    i_cloud = n_rank + n_dring  # cloud slice starts after the clone ring

    # Residual-head runs (es.split): also hinge the HEAD HALF's clone
    # cosine directly. The blended hinge alone dilutes the gradient — the
    # frozen trunk contributes (1-b) of the clone's blended score and the
    # head must go strongly NEGATIVE on clones to pull the blend below the
    # margin; hinging cos_head against its own positive reference puts the
    # full pressure where the only trainable parameters are.
    head_split = (es.split[0], 1.0) if es.split is not None else None
    cos_head = (
        _cos_to_template(emb1, tmpl, head_split)
        if head_split is not None
        else None
    )

    def ratio_hinge(c, c_h, valid, ref, ref_h):
        """max(0, peak_over_valid - margin*ref), blended + head half."""
        peak = jnp.max(jnp.where(valid, c, -1.0))
        v = jnp.maximum(
            0.0, peak - distractor_margin * jax.lax.stop_gradient(ref)
        )
        if c_h is not None:
            peak_h = jnp.max(jnp.where(valid, c_h, -1.0))
            v = v + jnp.maximum(
                0.0, peak_h - distractor_margin * jax.lax.stop_gradient(ref_h)
            )
        return jnp.where(jnp.any(valid), v, 0.0)

    logits = cos[:n_rank] / tau
    # Invalid (out-of-window) negatives drop out of the softmax; the true
    # box is kept regardless (p1 is always inside by construction).
    logits = jnp.where(
        valid[:n_rank] | (jnp.arange(n_rank) == 0), logits, -1e9
    )
    loss = -jax.nn.log_softmax(logits)[0]
    metrics = {
        "acc": (jnp.argmax(logits) == 0).astype(jnp.float32),
        "cos_pos": cos[0],
        "cos_neg_max": jnp.max(jnp.where(valid[:n_rank], cos[:n_rank], -1.0)[1:]),
        # Distractor-candidate cosine (last ranked slot), zeroed when the
        # distractor lies outside the window. The batch means divide out:
        # mean-over-valid = cos_distractor / distractor_valid. Watch the
        # pos-vs-distractor margin during lookalike training.
        "cos_distractor": jnp.where(valid[n_rank - 1], cos[n_rank - 1], 0.0),
        "distractor_valid": valid[n_rank - 1].astype(jnp.float32),
    }

    if distractor_weight > 0.0:
        # Ratio-margin on the distractor: the tracker's RELATIVE gates
        # (filter.lost_conf_ratio 0.55, redetect_accept_ratio 0.35) compare
        # a candidate's cosine to the locked confidence — a tracker stuck
        # on an impostor only escapes if the impostor's cosine sits BELOW
        # that fraction of the true match. InfoNCE separates the ranking
        # but not this ratio, so push the clone below margin*cos_pos
        # explicitly (stop_gradient: suppress the clone, don't inflate the
        # positive). The hinge takes the PEAK over the clone box and its
        # ring (see d_ring above): suppress the clone's local cosine
        # landscape, not one sample of it. See io/synthetic.py `lookalikes`.
        d_valid = valid[n_rank - 1 : i_cloud]
        viol = ratio_hinge(
            cos[n_rank - 1 : i_cloud],
            cos_head[n_rank - 1 : i_cloud] if cos_head is not None else None,
            d_valid,
            cos[0],
            cos_head[0] if cos_head is not None else None,
        )
        loss = loss + distractor_weight * viol

    if distractor_centered_weight > 0.0:
        # SELF-CENTERED distractor geometry (the false-lock/re-detection
        # case): when the particle cloud has drifted onto a lookalike, the
        # search window centers ON the clone — a window content the terms
        # above never produce (their window centers at p0, near the true
        # box). Window-mean centering then removes the shared background
        # component differently, and round-3 measured the clone's cosine
        # JUMPING from ~0.5 (shared window) to ~0.77 (self-centered) on the
        # `lookalikes` eval clip — above the tracker's re-lock bar. So
        # embed one extra window centered at d1 and (a) hinge the clone's
        # self-centered cosine below distractor_margin x the true box's
        # own cosine, (b) rank the true box ABOVE the clone within this
        # window when both are visible — exactly the decision the tiled
        # global re-detection makes.
        poold = make_dense_embedder(prm, frame1, d1, side, es, remat=True)
        # [clone, clone ring..., true]: hinge the clone-landscape PEAK, and
        # rank the true box above every clone-region box in this window.
        cand_d = jnp.concatenate([d1[None], d_ring, p1[None]], axis=0)
        embd, validd = poold(cand_d, jnp.broadcast_to(wh, cand_d.shape))
        cos_d = _cos_to_template(embd, tmpl, es.split)  # [n_dring + 2]
        cos_d_h = (
            _cos_to_template(embd, tmpl, head_split)
            if head_split is not None
            else None
        )
        i_true = n_dring + 1
        viol_c = ratio_hinge(
            cos_d[:i_true],
            cos_d_h[:i_true] if cos_d_h is not None else None,
            validd[:i_true],
            cos[0],
            cos_head[0] if cos_head is not None else None,
        )
        logits_d = jnp.where(
            validd | (jnp.arange(n_dring + 2) == i_true), cos_d / tau, -1e9
        )
        rank_c = -jax.nn.log_softmax(logits_d)[i_true]
        loss = loss + distractor_centered_weight * (
            viol_c + jnp.where(validd[i_true], rank_c, 0.0)
        )
        metrics["cos_dc_clone"] = cos_d[0]
        # Lookalike-subset telemetry: batch-mean of value*look_on divides
        # by batch-mean of look_on to give the hard-subset average.
        metrics["cos_dc_clone_look"] = cos_d[0] * look_on
        metrics["cos_dc_true_look"] = cos_d[i_true] * look_on
        metrics["look_frac"] = look_on

    if distractor_absent_weight > 0.0:
        # TARGET-ABSENT clone hinge (the occlusion context): window-mean
        # centering makes every cosine context-dependent, so a clone
        # suppressed in windows that also contain the true target can
        # still peak high once the target is occluded — and that is the
        # exact context in which the lost / re-lock / re-detect gates
        # consume the score. frame2 is frame1's scene with the target
        # erased; hinge the clone's local cosine PEAK there below
        # margin x the (visible-target) reference. No rank term: there is
        # nothing to rank above. For d_on=0 samples the window is pure
        # background — hinging that low suppresses re-detect false
        # positives on empty scenes, also wanted.
        poola = make_dense_embedder(prm, frame2, d1, side, es, remat=True)
        cand_a = jnp.concatenate([d1[None], d_ring], axis=0)
        emba, valida = poola(cand_a, jnp.broadcast_to(wh, cand_a.shape))
        cos_a = _cos_to_template(emba, tmpl, es.split)  # [n_dring + 1]
        cos_a_h = (
            _cos_to_template(emba, tmpl, head_split)
            if head_split is not None
            else None
        )
        da_peak = jnp.max(jnp.where(valida, cos_a, -1.0))
        loss = loss + distractor_absent_weight * ratio_hinge(
            cos_a,
            cos_a_h,
            valida,
            cos[0],
            cos_head[0] if cos_head is not None else None,
        )
        metrics["cos_da_peak"] = da_peak
        metrics["cos_da_peak_look"] = da_peak * look_on

    if n_cloud:
        # Closed-loop posterior-mean loss (round-3 diagnosis): the round-2
        # checkpoint RANKED candidates at 0.94 accuracy yet tracked ~2x
        # worse than random init — its cosine field had a sharp true peak
        # but heavier off-peak tails, and the filter's POSTERIOR MEAN is
        # dragged by tails no ranking loss sees. So weight a particle-like
        # cloud exactly as the tracker does (zcos: softmax of
        # zscale * zscore-over-cloud, ops/likelihood.py) and penalize the
        # posterior expected squared error E_w[||x - p1||^2] — gradient
        # pushes cosine DOWN on far candidates proportional to distance,
        # i.e. directly shapes the estimator the eval measures.
        c_cos = cos[i_cloud:]
        c_valid = valid[i_cloud:]
        nv = jnp.maximum(jnp.sum(c_valid), 1)
        mu = jnp.sum(jnp.where(c_valid, c_cos, 0.0)) / nv
        var = jnp.sum(jnp.where(c_valid, (c_cos - mu) ** 2, 0.0)) / nv
        z = (c_cos - mu) * jax.lax.rsqrt(var + 1e-6)
        w = jax.nn.softmax(jnp.where(c_valid, cloud_zscale * z, -1e9))
        err2 = jnp.sum((cloud - p1[None, :]) ** 2, axis=-1)  # [n_cloud] px^2
        cloud_err2 = jnp.sum(w * err2)
        # Normalize by the cloud's prior spread so the term is O(1) and
        # box-size free: E_prior[err^2] = 2 * cloud_sigma^2.
        loss = loss + cloud_weight * cloud_err2 / (2.0 * cloud_sigma**2)
        metrics["cloud_px"] = jnp.sqrt(cloud_err2)
    return loss, metrics


def batch_loss(prm: dict, es: DenseEmbedSpec, batch, keys, **kw):
    """Mean loss over a SceneBatch; returns (loss, metrics means)."""
    losses, metrics = jax.vmap(
        lambda f0, f1, p0, p1, wh, d1, lk, f2, k: pair_loss(
            prm, es, f0, f1, p0, p1, wh, d1, lk, f2, k, **kw
        )
    )(
        batch.frame0, batch.frame1, batch.p0, batch.p1, batch.wh,
        batch.d1, batch.look_on, batch.frame2, keys,
    )
    return jnp.mean(losses), {k: jnp.mean(v) for k, v in metrics.items()}
