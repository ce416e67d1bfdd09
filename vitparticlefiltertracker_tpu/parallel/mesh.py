"""Device mesh + sharding substrate (component B11, SURVEY.md §2.2).

The reference has no distributed backend at all (SURVEY.md §2.1); scaling is
designed TPU-natively: a 2D `jax.sharding.Mesh` with axes

    ("bank", "particle")

- **bank** — data parallelism over independent filter banks (multi-object,
  BASELINE.json:10 "8 filter banks x 1k particles").
- **particle** — the domain's scale axis (BASELINE.json:9,11: 4k/16k
  particles): particle-batched activations (crops, tokens, embeddings,
  weights) shard along it; ViT weights are replicated (a ViT is small; the
  batch is what's big — the classic inference-DP layout).

Collectives are inserted by XLA from sharding annotations on the jitted
tracker step: the log-weight normalization's logsumexp and the resampling
cumsum trigger all-reduce/all-gather over "particle" on ICI. No hand-written
NCCL-style code exists anywhere — `jax.jit` + `NamedSharding` is the whole
backend.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(banks: int = 1, particles: int = 1, devices=None) -> Mesh:
    """Build a ("bank", "particle") mesh over `banks * particles` devices."""
    if devices is None:
        devices = jax.devices()
    n = banks * particles
    if n > len(devices):
        raise ValueError(
            f"mesh ({banks} banks x {particles} particle shards) needs {n} "
            f"devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(banks, particles)
    return Mesh(dev, axis_names=("bank", "particle"))


def auto_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Factor n into (bank, particle) — favor the particle axis, which is
    the axis that actually grows in this domain."""
    bank = 1
    for cand in (2, 4, 8):
        if n_devices % cand == 0 and n_devices // cand >= 2:
            bank = cand
            break
    if n_devices % bank:
        bank = 1
    return bank, n_devices // bank


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def banked_state_sharding(mesh: Mesh, state_example) -> Any:
    """Sharding pytree for a banked TrackerState: leading axis -> "bank",
    per-particle arrays also shard their particle axis -> "particle".

    Layout rule (applies to any [K, N, ...] pytree leaf):
      ndim >= 2 and second dim == num_particles -> P("bank", "particle", ...)
      ndim >= 1 (per-bank scalars/vectors)      -> P("bank")
    """
    import jax.tree_util as jtu

    # Find N from the particles leaf: state.pf.particles [K, N, 5].
    n = state_example.pf.particles.shape[1]

    def leaf_sharding(x):
        if x.ndim >= 2 and x.shape[1] == n:
            spec = P("bank", "particle", *([None] * (x.ndim - 2)))
        elif x.ndim >= 1:
            spec = P("bank", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jtu.tree_map(leaf_sharding, state_example)
