"""Appearance likelihood: particle embeddings vs. template (component B8).

BASELINE.json:5: "appearance-likelihood weighting against a template
embedding". Log-likelihood is a temperature-scaled cosine similarity — the
standard appearance metric for deep-feature trackers; temperature controls
how peaked the posterior is (config: filter.likelihood_temp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


# `split`: optional (d_trunk, blend) for residual-head features
# (models/vit.py:VitSpec.head_depth). Features are concat(trunk, head) along
# the last axis; each half is normalized INDEPENDENTLY and the score is the
# blend (1-b)*cos_trunk + b*cos_head. At b=0 this is bit-exactly the
# trunk-only (headless) cosine, which is what makes a trained head unable to
# erode the random-init trunk's matched-filter landscape.


def l2_normalize_split(
    x: jax.Array, split: tuple[int, float] | None = None, eps: float = 1e-8
) -> jax.Array:
    """L2-normalize the last axis; with `split`, each half independently.

    The split form keeps both halves UNIT norm (no blend scaling baked in —
    the blend lives in the cosine, so one stored template serves any
    head_blend)."""
    if split is None:
        return l2_normalize(x, eps=eps)
    d, _ = split
    return jnp.concatenate(
        [l2_normalize(x[..., :d], eps=eps), l2_normalize(x[..., d:], eps=eps)],
        axis=-1,
    )


def _cos_to_template(
    embeddings: jax.Array,
    template: jax.Array,
    split: tuple[int, float] | None = None,
) -> jax.Array:
    """Cosine similarity of N embeddings to the template -> [N].

    Two template shapes:
      * [D]     — single pooled appearance vector: plain cosine.
      * [C, D]  — STRUCTURED template (C spatial cells, each L2-normalized,
        from ops/image.py:roi_cells_mxu): embeddings are [N, C, D] and the
        score is the mean of per-cell cosines — preserving layout inside the
        box, which a single pooled vector cannot (aperture-prone targets).

    With `split` = (d, b), embeddings/template are concat(trunk, head)
    features (each template half unit-normalized per cell) and the score is
    (1-b)*cos_trunk + b*cos_head.
    """
    if split is not None:
        d, b = split
        cos_f = _cos_to_template(embeddings[..., :d], template[..., :d])
        cos_h = _cos_to_template(embeddings[..., d:], template[..., d:])
        return (1.0 - b) * cos_f + b * cos_h
    emb = l2_normalize(embeddings.astype(jnp.float32), axis=-1)
    tmpl = template.astype(jnp.float32)
    if template.ndim == 1:
        return emb @ tmpl
    return jnp.einsum("ncd,cd->n", emb, tmpl) / template.shape[0]


def cosine_log_likelihood(
    embeddings: jax.Array,  # [N, D] or [N, C, D]
    template: jax.Array,  # [D] or [C, D] (L2-normalized per cell)
    temperature: float,
    split: tuple[int, float] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (log_likelihood [N], cosine similarities [N]).

    loglik_n = temperature * cos(emb_n, template). Additive constants are
    irrelevant (weights get normalized), so no partition term is needed.
    """
    cos = _cos_to_template(embeddings, template, split)
    return temperature * cos, cos


def znormed_log_likelihood(
    embeddings: jax.Array,  # [N, D] or [N, C, D]
    template: jax.Array,  # [D] or [C, D] (L2-normalized per cell)
    temperature: float,
    eps: float = 1e-6,
    mask: jax.Array | None = None,  # [N] bool: True = valid particle
    split: tuple[int, float] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Self-normalizing likelihood: temperature * zscore_over_particles(cos).

    Raw cosine spreads depend on the feature statistics (a random-init ViT
    yields cosines clustered in ~[0.95, 1.0]; a trained one spreads wider).
    With a fixed temperature the posterior entropy therefore swings between
    "uniform" (filter ignores appearance, follows the motion prior and lags)
    and "collapsed". Z-scoring the cosines across the particle set pins the
    log-weight SPREAD to `temperature` standard deviations every frame, so
    the filter's appearance/motion balance is invariant to the embedding
    scale. All ops are vectorized reductions — nothing leaves the device.

    `mask` excludes invalid particles (out of the search window — their
    clamped-edge cosines are garbage) from the mu/sd statistics; this matters
    most during lost/re-detect, when boosted noise pushes many particles out
    of the window and unmasked stats would be dominated by edge artifacts
    (round-1 ADVICE finding). Masked entries still receive a z-score (from
    the valid-set statistics); the caller down-weights them separately.
    """
    cos = _cos_to_template(embeddings, template, split)
    return znormed_logits_from_cos(cos, temperature, eps, mask), cos


def znormed_logits_from_cos(
    cos: jax.Array,  # [N] precomputed cosine scores
    temperature: float,
    eps: float = 1e-6,
    mask: jax.Array | None = None,
) -> jax.Array:
    """The z-normalization half of znormed_log_likelihood, for callers that
    compute cosines without materializing embeddings (the fused
    structured-template scorer, models/embedder.py:score_from_feat)."""
    if mask is None:
        mu = jnp.mean(cos)
        sd = jnp.std(cos)
    else:
        m = mask.astype(cos.dtype)
        count = jnp.maximum(jnp.sum(m), 1.0)
        mu = jnp.sum(cos * m) / count
        var = jnp.sum(jnp.square(cos - mu) * m) / count
        sd = jnp.sqrt(var)
    z = (cos - mu) / (sd + eps)
    return temperature * z


def landscape_spread(
    cos: jax.Array,  # [N] cosine scores at the particle positions
    xy: jax.Array,  # [N, 2] particle positions (frame px)
    top_frac: float,  # prominence fraction defining the "comparable" top set
    mask: jax.Array | None = None,  # [N] bool: True = valid particle
) -> jax.Array:
    """Top-slice spatial spread of a cosine landscape -> [] f32 (px).

    Weight each particle by relu(cos - (max - top_frac*(max - mean))) —
    only particles whose score sits within the top `top_frac` of the
    peak's prominence over the landscape mean count, linearly by margin.
    Two rejected designs, both measured on synthetic landscapes: a
    z-score softmax collapses onto the single best particle (the noise
    floor's sd turns millicosine mode gaps into huge z-gaps), and an
    exponential prominence weighting drowns the top set in accumulated
    floor mass (500 particles x e^-3 outweighs the few near-peak ones).
    The hard slice excludes the floor exactly, is invariant to affine
    rescaling of the scores, and is particle-count-robust. Returns the
    RMS distance of the particles from their weighted mean: a sharp
    unimodal matched-filter landscape reads a few px; a confused one (a
    lookalike inside the cloud scoring within top_frac of the target)
    reads ~the mode separation. This is the confusion signal the
    automatic head-blend policy feeds on (model.head_blend_auto).
    """
    if mask is None:
        mask = jnp.ones(cos.shape, bool)
    neg = jnp.asarray(-jnp.inf, cos.dtype)
    cmax = jnp.max(jnp.where(mask, cos, neg))
    cnt = jnp.maximum(jnp.sum(mask), 1)
    cmean = jnp.sum(jnp.where(mask, cos, 0.0)) / cnt
    thr = cmax - top_frac * jnp.maximum(cmax - cmean, 1e-6)
    w = jnp.where(mask, jnp.maximum(cos - thr, 0.0), 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    mu = jnp.sum(w[:, None] * xy, axis=0)
    var = jnp.sum(w * jnp.sum(jnp.square(xy - mu[None, :]), axis=-1))
    return jnp.sqrt(var + 1e-12)


def auto_blend_target(
    spread: jax.Array,  # [] trunk-landscape spread (px)
    box_diag: jax.Array,  # [] current target box diagonal (px)
    lo: float,  # spread/diag at-or-below which blend = b_min
    hi: float,  # spread/diag at-or-above which blend = b_max
    b_min: float,
    b_max: float,
) -> jax.Array:
    """Map trunk-landscape confusion to a per-step head blend -> [] f32.

    spread/box_diag <= lo: the trunk's matched filter is unimodal and sharp —
    the head can only tax localization (the needle/aperture regime, measured
    round 4: b=0.5 lost to b=0.2 by 3.0-vs-2.7 raw / 4.2-vs-2.7 mp4) — use
    b_min. >= hi: the trunk is confused (mass split across lookalike modes) —
    lean on the head's discrimination, b_max. Linear in between.
    """
    t = jnp.clip((spread / jnp.maximum(box_diag, 1e-6) - lo) / (hi - lo), 0.0, 1.0)
    return jnp.float32(b_min) + (jnp.float32(b_max) - jnp.float32(b_min)) * t


def center_embeddings(
    embeddings: jax.Array,  # [..., M, D]
    mean_emb: jax.Array,  # [..., D] shared-context embedding to remove
) -> jax.Array:
    """Subtract a context-mean embedding before cosine comparison.

    ROI/crop embeddings from one frame share a large common component (global
    image statistics dominate mean-pooled ViT features), which compresses all
    pairwise cosines toward 1 and buries the discriminative signal. Removing
    the window-mean embedding is a one-op whitening that restores contrast.
    """
    return embeddings - mean_emb[..., None, :]
