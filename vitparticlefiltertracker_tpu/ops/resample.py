"""Systematic resampling lowered to cumsum + searchsorted inside jit.

Semantics are defined by the scalar-loop oracle
(oracle/numpy_filter.py:systematic_resample_indices); this is the
TPU-friendly lowering mandated by BASELINE.json:5 ("resampling lowers to
cumsum+searchsorted inside jit"): a parallel prefix-sum and a vectorized
binary search, both of which XLA maps onto the VPU with no data-dependent
control flow — jit/vmap/shard-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def systematic_resample_indices(weights: jax.Array, u: jax.Array) -> jax.Array:
    """Ancestor indices idx[i] = min{j : cumsum(w)[j] >= (u+i)/N}.

    weights: [N] normalized probabilities (sum ~ 1), any float dtype.
    u: scalar U[0,1) draw (one per resampling event — "systematic").
    Returns [N] int32 ancestor indices, sorted ascending by construction.
    """
    n = weights.shape[0]
    dtype = weights.dtype
    positions = (u.astype(dtype) + jnp.arange(n, dtype=dtype)) / n
    cumsum = jnp.cumsum(weights)
    # Guard against cumsum[-1] < 1 from float undersum (oracle does the same).
    cumsum = cumsum.at[-1].set(jnp.maximum(cumsum[-1], jnp.asarray(1.0, dtype)))
    idx = jnp.searchsorted(cumsum, positions, side="left")
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def resample(
    particles: jax.Array, weights: jax.Array, u: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Gather a fresh equal-weight particle set from the posterior."""
    idx = systematic_resample_indices(weights, u)
    return jnp.take(particles, idx, axis=0), idx
