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


def cosine_log_likelihood(
    embeddings: jax.Array,  # [N, D]
    template: jax.Array,  # [D] (assumed L2-normalized)
    temperature: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns (log_likelihood [N], cosine similarities [N]).

    loglik_n = temperature * cos(emb_n, template). Additive constants are
    irrelevant (weights get normalized), so no partition term is needed.
    """
    emb = l2_normalize(embeddings.astype(jnp.float32))
    cos = emb @ template.astype(jnp.float32)
    return temperature * cos, cos
