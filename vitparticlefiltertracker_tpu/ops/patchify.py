"""Batched particle-crop extraction + patch embedding (component B6).

BASELINE.json:5: "Batched particle-crop extraction becomes a fused
gather+patchify kernel so all N particle hypotheses share one ViT forward
pass per frame." For each particle box (any float center/size), sample a
crop_size x crop_size pixel grid bilinearly from the frame and patch-embed
it — producing [N, T, D] tokens that feed ONE batched ViT encoder call.

Two paths:
  * `gather_patchify` — the composite XLA lowering: one big gather-based
    bilinear sample (4 gathers + lerp across all N*T*p*p points at once)
    followed by ONE [N*T, p²C] x [p²C, D] MXU matmul. XLA fuses the
    elementwise lerp chain; the matmul is the FLOPs. This is the always-
    available fallback mandated by SURVEY.md §7 ("the kernel is an
    optimization, not a dependency").
  * `gather_patchify_pallas` — Pallas TPU kernel that keeps the sampled
    pixels in VMEM and fuses sampling straight into the patch-embed matmul
    (ops/patchify_pallas.py), dispatched automatically on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.ops.image import bilinear_sample


def crop_sample_coords(
    centers: jax.Array,  # [N, 2] box centers (x, y) in frame px
    sizes: jax.Array,  # [N, 2] box (w, h) in frame px
    crop_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-particle crop sampling grids -> (ys, xs), each [N, crop, crop]."""
    n = centers.shape[0]
    t = (jnp.arange(crop_size, dtype=jnp.float32) + 0.5) / crop_size - 0.5
    ys = centers[:, 1:2] + sizes[:, 1:2] * t[None, :]  # [N, crop]
    xs = centers[:, 0:1] + sizes[:, 0:1] * t[None, :]
    ys = jnp.broadcast_to(ys[:, :, None], (n, crop_size, crop_size))
    xs = jnp.broadcast_to(xs[:, None, :], (n, crop_size, crop_size))
    return ys, xs


def extract_crops(
    frame: jax.Array,  # [H, W, C] normalized float frame
    centers: jax.Array,
    sizes: jax.Array,
    crop_size: int,
) -> jax.Array:
    """[N, crop, crop, C] bilinear crops (resampled, static shape)."""
    ys, xs = crop_sample_coords(centers, sizes, crop_size)
    return bilinear_sample(frame, ys, xs)


def extract_crops_mxu(
    frame: jax.Array,  # [H, W, C] float frame
    centers: jax.Array,  # [N, 2]
    sizes: jax.Array,  # [N, 2]
    crop_size: int,
    region: int = 64,
) -> jax.Array:
    """Gather-free crop extraction: dynamic-slice a static [R, R] region per
    particle, then separable bilinear via hat-weight batched matmuls
    (ops/image.py:hat_weights). All FLOPs land on the MXU.

    `region` must cover the largest expected box extent in pixels; samples
    beyond it clamp to the region edge (matches clamp-to-edge semantics for
    in-frame boxes that fit the region).
    """
    h, w, c = frame.shape
    r = min(region, h, w)
    t = (jnp.arange(crop_size, dtype=jnp.float32) + 0.5) / crop_size - 0.5
    ys = jnp.clip(centers[:, 1:2] + sizes[:, 1:2] * t[None, :], 0.0, h - 1.0)
    xs = jnp.clip(centers[:, 0:1] + sizes[:, 0:1] * t[None, :], 0.0, w - 1.0)
    y0 = jnp.clip(jnp.round(centers[:, 1]) - r // 2, 0, h - r).astype(jnp.int32)
    x0 = jnp.clip(jnp.round(centers[:, 0]) - r // 2, 0, w - r).astype(jnp.int32)

    regions = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(frame, (y, x, 0), (r, r, c))
    )(y0, x0)  # [N, R, R, C]

    from vitparticlefiltertracker_tpu.ops.image import hat_weights

    wy = hat_weights(ys - y0[:, None].astype(jnp.float32), r)  # [N, crop, R]
    wx = hat_weights(xs - x0[:, None].astype(jnp.float32), r)
    a = jnp.einsum("nkr,nrwc->nkwc", wy, regions)
    return jnp.einsum("njw,nkwc->nkjc", wx, a)  # [N, crop, crop, C]


def gather_patchify(
    frame: jax.Array,  # [H, W, C] normalized float frame
    centers: jax.Array,  # [N, 2]
    sizes: jax.Array,  # [N, 2]
    crop_size: int,
    patch_size: int,
    kernel: jax.Array,  # [p*p*C, D] patch-embed weight
    bias: jax.Array,  # [D]
    region: int = 64,
    use_mxu: bool = True,
) -> jax.Array:
    """Fused crop-extract + patchify + embed -> [N, T, D] tokens.

    The sampling lowers to matmuls (MXU path) or gathers+lerp (fallback);
    the embed is a single MXU matmul over all N crops' patches.
    """
    n = centers.shape[0]
    c = frame.shape[-1]
    p = patch_size
    g = crop_size // p
    if use_mxu:
        crops = extract_crops_mxu(frame, centers, sizes, crop_size, region)
    else:
        crops = extract_crops(frame, centers, sizes, crop_size)  # [N, s, s, C]
    x = crops.reshape(n, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
    tokens = x.reshape(n, g * g, p * p * c)
    dtype = kernel.dtype
    return tokens.astype(dtype) @ kernel + bias.astype(dtype)
