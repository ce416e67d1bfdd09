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


def make_mesh(
    banks: int = 1, particles: int = 1, model: int = 1, devices=None
) -> Mesh:
    """Build a ("bank", "particle", "model") mesh.

    The "model" axis tensor-parallelizes the ViT (SURVEY.md §2.2): attention
    heads and the MLP hidden dimension shard across it (vit_param_sharding),
    for ViT-L at high particle counts where weights+activations outgrow one
    chip's HBM headroom. Axes of size 1 are free.
    """
    if devices is None:
        devices = jax.devices()
    n = banks * particles * model
    if n > len(devices):
        raise ValueError(
            f"mesh ({banks} bank x {particles} particle x {model} model) "
            f"needs {n} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(banks, particles, model)
    return Mesh(dev, axis_names=("bank", "particle", "model"))


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


def vit_param_sharding(mesh: Mesh, params) -> Any:
    """Tensor-parallel sharding pytree for the ViT params (Megatron-style).

    Column-parallel first matmuls (wqkv over fused head outputs, mlp.w1 over
    the hidden dim), row-parallel second matmuls (wo, mlp.w2 over their
    contraction dim) — GSPMD then inserts exactly one all-reduce per
    residual branch over the "model" axis. Embeddings, LayerNorms, and
    biases of row-parallel outputs replicate. Works on the stacked
    [depth, ...] block leaves (leading scan axis unsharded).

    Sharding validity requires heads % model_axis == 0 and
    mlp_dim % model_axis == 0 (callers assert via check_tp_divisibility).
    """
    import jax.tree_util as jtu

    model_ax = "model" if "model" in mesh.axis_names else None
    if model_ax is None or mesh.shape[model_ax] == 1:
        return jtu.tree_map(lambda _: replicated(mesh), params)

    def spec_for(path: tuple, x) -> NamedSharding:
        keys = tuple(
            getattr(k, "key", getattr(k, "name", None)) for k in path
        )
        if "attn" in keys and keys[-1] in ("wqkv", "bqkv"):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), model_ax))
        if "attn" in keys and keys[-1] == "wo":
            return NamedSharding(mesh, P(None, model_ax, None))
        if "mlp" in keys and keys[-1] in ("w1", "b1"):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), model_ax))
        if "mlp" in keys and keys[-1] == "w2":
            return NamedSharding(mesh, P(None, model_ax, None))
        return replicated(mesh)

    return jtu.tree_map_with_path(spec_for, params)


def check_tp_divisibility(heads: int, mlp_dim: int, model_axis: int) -> None:
    if heads % model_axis or mlp_dim % model_axis:
        raise ValueError(
            f"tensor-parallel axis {model_axis} must divide model.heads "
            f"({heads}) and model.mlp_dim ({mlp_dim})"
        )


def tracker_state_sharding(mesh: Mesh, state_example) -> Any:
    """Sharding pytree for a SINGLE-object TrackerState: the particle-filter
    leaves shard their leading N axis over "particle"; everything else
    (template, window center, RNG key, flags) replicates. This is the
    single-`Tracker` analog of banked_state_sharding — used when
    runtime.mesh_particles > 1 without banks (eval configs 3/5: one target,
    4k-16k particles)."""
    import jax.tree_util as jtu

    rep = replicated(mesh)
    pf_sh = jtu.tree_map(
        lambda x: NamedSharding(mesh, P("particle", *([None] * (x.ndim - 1)))),
        state_example.pf,
    )
    return jtu.tree_map(lambda _: rep, state_example)._replace(pf=pf_sh)


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
