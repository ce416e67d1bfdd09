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
