"""Vision ops: normalize / bilinear sampling / window extraction / ROI pool.

Component "Vision ops (JAX)" in SURVEY.md §1.2. Everything here is static-
shape: arbitrary float window positions and sizes are handled by *sampling*
a fixed-size grid bilinearly (gather + lerp), never by dynamic-shape slicing
— the XLA-friendly equivalent of crop/resize (BASELINE.json:5 "frame
decode/resize/normalize" feeding the ViT).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# ImageNet normalization, the de-facto standard for ViT backbones.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_frame(frame: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [H, W, 3] -> normalized float [H, W, 3] (on device, in-step)."""
    x = frame.astype(dtype) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (x - mean) / std


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at float coords (ys, xs) [...], clamp-to-edge.

    Coordinates are pixel-centered: (0, 0) is the center of the top-left
    pixel. Returns [..., C]. Lowers to 4 gathers + lerp on the VPU.
    """
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    # Flatten spatial dims -> one gather axis (TPU-friendly single gather).
    flat = img.reshape(h * w, -1)

    def take(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    v00, v01 = take(y0, x0), take(y0, x1)
    v10, v11 = take(y1, x0), take(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def hat_weights(coords: jax.Array, size: int, dtype=jnp.float32) -> jax.Array:
    """Bilinear interpolation as a dense matrix: W[i, r] = max(0, 1-|t_i - r|).

    For clamped coords t in [0, size-1], each row has <=2 nonzeros summing to
    1 and W @ values == linear interpolation at t. This turns arbitrary-
    position resampling into an MXU matmul — the TPU-native alternative to
    gathers, whose lowering is the classic TPU weak spot.
    coords: [..., M] float sample positions. Returns [..., M, size].
    """
    t = jnp.clip(coords.astype(dtype), 0.0, size - 1.0)
    r = jnp.arange(size, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(t[..., None] - r))


def extract_window_mxu(
    img: jax.Array, center: jax.Array, side: jax.Array, out_size: int
) -> jax.Array:
    """extract_window lowered to two matmuls (separable bilinear resample).

    img [H, W, C] -> [out, out, C]. Cost ~ out*H*W*C + out*out*W*C MACs —
    microseconds on the MXU — with zero gathers.
    """
    h, w, c = img.shape
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size - 0.5
    wy = hat_weights(center[1] + side * t, h)  # [out, H]
    wx = hat_weights(center[0] + side * t, w)  # [out, W]
    a = wy @ img.reshape(h, w * c)  # [out, W*C]
    a = a.reshape(out_size, w, c).transpose(0, 2, 1).reshape(out_size * c, w)
    b = a @ wx.T  # [out*C, out]
    return b.reshape(out_size, c, out_size).transpose(0, 2, 1)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("pixels", "origin"),
    meta_fields=("stride",),
)
@dataclasses.dataclass(frozen=True)
class FrameView:
    """A (possibly cropped and decimated) view of a video frame.

    All tracker math stays in FULL-FRAME pixel coordinates; only pixel
    *sampling* maps through the view:  view_px = (frame_px - origin)/stride.
    This is what makes ROI-only host->device shipping possible (component
    B12 / BASELINE.json:11 4K streaming): the host crops a small region
    around the predicted target and ships ~0.1-1%% of the 4K frame, while
    the device step is numerically identical (up to float-addition
    reordering, ~1 ulp) whenever the search window lies inside the view —
    hat-weight resampling only reads sampled pixels.

    pixels: [h, w, 3] uint8 or float (0..255 scale) — ROI or whole frame
    origin: [2] f32 (x0, y0) frame coords of pixels[0, 0]'s center
    stride: STATIC float — frame px per view px (pytree aux data, so jit
        specializes per stride: full-frame and ROI paths compile separately
        and a changing origin never recompiles)
    """

    pixels: jax.Array
    origin: jax.Array
    stride: float = 1.0


class StreamFrame(NamedTuple):
    """Per-frame device input of the ROI streaming path (component B12).

    track: stride-1 (or lightly decimated) crop around the predicted target
        — what the per-frame H2D actually ships (~0.5 MB at 4K instead of
        the full 24.9 MB frame).
    glob: decimated WHOLE frame (stride >> 1), refreshed every few frames
        and re-used from device memory in between — feeds global
        re-detection and defines the full-frame bounds, so a target that
        escapes the ROI entirely is still recoverable.
    """

    track: FrameView
    glob: FrameView


def full_view(frame_f32: jax.Array) -> FrameView:
    """The whole frame as a view (origin 0, stride 1 — folds to no-ops)."""
    return FrameView(
        pixels=frame_f32, origin=jnp.zeros((2,), jnp.float32), stride=1.0
    )


def view_extract_window_mxu(
    view: FrameView, center: jax.Array, side: jax.Array, out_size: int
) -> jax.Array:
    """extract_window_mxu through a FrameView (frame-coord center/side).

    Decimation (stride > 1) composes with the hat-weight resample: the
    window grid is laid out in view pixels, so the two matmuls are
    unchanged — only the sample coordinates shift/scale. Clamping happens
    at the VIEW edge; the host-side cropper is responsible for margin.
    """
    inv = 1.0 / float(view.stride)
    return extract_window_mxu(
        view.pixels, (center - view.origin) * inv, side * inv, out_size
    )


def window_grid(center: jax.Array, side: jax.Array, out_size: int) -> tuple[jax.Array, jax.Array]:
    """Sample coords (ys, xs) [out, out] of a square window in source pixels.

    center: [2] = (x, y); side: scalar window side length in source px.
    The window is resampled onto an out_size x out_size grid, so any float
    window maps to a static shape.
    """
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size - 0.5  # [-.5, .5)
    ys = center[1] + side * t
    xs = center[0] + side * t
    return jnp.broadcast_to(ys[:, None], (out_size, out_size)), jnp.broadcast_to(
        xs[None, :], (out_size, out_size)
    )


def extract_window(
    img: jax.Array, center: jax.Array, side: jax.Array, out_size: int
) -> jax.Array:
    """Resample a square window (any float center/side) to [out, out, C]."""
    ys, xs = window_grid(center, side, out_size)
    return bilinear_sample(img, ys, xs)


def frame_to_window_coords(
    pts_xy: jax.Array, center: jax.Array, side: jax.Array, out_size: int
) -> jax.Array:
    """Map frame-pixel (x, y) points [..., 2] into window-pixel coords.

    Inverse of window_grid: window pixel i samples frame coord
    c + side*((i+0.5)/out - 0.5), so i = ((p-c)/side + 0.5)*out - 0.5.
    """
    return ((pts_xy - center) / side + 0.5) * out_size - 0.5


def roi_pool(
    feat: jax.Array,  # [Gh, Gw, D] token feature grid
    centers: jax.Array,  # [N, 2] box centers in feature-grid coords
    sizes: jax.Array,  # [N, 2] box (w, h) in feature-grid units
    grid: int,  # K: KxK ROI-align sample points
) -> jax.Array:
    """ROI-align: mean of KxK bilinear samples per box -> [N, D].

    This is how all N particle hypotheses share ONE ViT forward per frame
    (BASELINE.json:5): the ViT runs once on the search window, and each
    hypothesis reads its appearance embedding from the token grid.
    """
    n = centers.shape[0]
    t = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5  # K offsets in [-.5,.5)
    # [N, K] per-axis sample coords
    ys = centers[:, 1:2] + sizes[:, 1:2] * t[None, :]
    xs = centers[:, 0:1] + sizes[:, 0:1] * t[None, :]
    # [N, K, K]
    ys2 = jnp.broadcast_to(ys[:, :, None], (n, grid, grid))
    xs2 = jnp.broadcast_to(xs[:, None, :], (n, grid, grid))
    samples = bilinear_sample(feat, ys2, xs2)  # [N, K, K, D]
    return jnp.mean(samples, axis=(1, 2))


def roi_cells_mxu(
    feat: jax.Array,  # [Gh, Gw, D]
    centers: jax.Array,  # [N, 2] grid coords (x, y)
    sizes: jax.Array,  # [N, 2] grid units (w, h)
    grid: int,
) -> jax.Array:
    """Per-cell ROI features WITHOUT pooling -> [N, K, K, D].

    The structured-template appearance mode (tracker.appearance: "cells")
    compares each of the KxK sample cells separately, preserving spatial
    layout inside the box — what a single mean-pooled vector throws away
    (and what elongated/aperture-prone targets need). Same separable
    hat-weight lowering as roi_pool_mxu, kept per-sample instead of
    averaged: two batched MXU contractions, no gathers.
    """
    gh, gw, d = feat.shape
    t = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5
    ys = centers[:, 1:2] + sizes[:, 1:2] * t[None, :]  # [N, K]
    xs = centers[:, 0:1] + sizes[:, 0:1] * t[None, :]
    wy = hat_weights(ys, gh)  # [N, K, Gh]
    wx = hat_weights(xs, gw)  # [N, K, Gw]
    f32 = feat.astype(jnp.float32)
    a = jnp.einsum("nkr,rcd->nkcd", wy, f32)  # [N, K, Gw, D]
    return jnp.einsum("njc,nkcd->nkjd", wx, a)  # [N, K(y), K(x), D]


def roi_cells_cos_mxu(
    feat: jax.Array,  # [Gh, Gw, D] window token features
    mean_emb: jax.Array | None,  # [D] window-mean embedding (None = no centering)
    tmpl: jax.Array,  # [K*K, D] per-cell L2-normalized template rows
    centers: jax.Array,  # [N, 2] grid coords (x, y)
    sizes: jax.Array,  # [N, 2] grid units (w, h)
    grid: int,
) -> jax.Array:
    """Fused structured-template cosine scores -> [N] (mean per-cell cos).

    Numerically equivalent (up to sum reordering) to
        cells = roi_cells_mxu(feat, centers, sizes, K)        # [N, K, K, D]
        cos   = mean_c  <l2_normalize(cells_c - mean_emb), tmpl_c>
    but WITHOUT materializing the [N, K, K, D] cells: the cosine needs only
    each cell's dot-with-template and L2 norm, and both are bilinear in the
    hat weights, so D collapses into two small per-frame maps — the
    template projection G = F'·tmplᵀ [P, C] and the token Gram H = F'·F'ᵀ
    [P, P] (P = Gh·Gw tokens). Per-particle work then contracts [N, C, P]
    weight rows against them. At eval-3 scale (4096 particles, ViT-L
    D=1024) this replaces ~1.5 GB/step of HBM intermediates
    ([N,K,Gw,D] + [N,K,K,D]) with ~160 MB — the pooling stage measured
    ~2x the ViT forward itself before this (docs/profile_runs.jsonl).

    Centering commutes into F' because every hat-weight row sums to 1
    (partition of unity, including at clamped edges): the pooled cell of
    (F - m) equals (pooled cell of F) - m.
    """
    gh, gw, d = feat.shape
    n = centers.shape[0]
    c = grid * grid
    p = gh * gw
    f = feat.astype(jnp.float32).reshape(p, d)
    if mean_emb is not None:
        f = f - mean_emb.astype(jnp.float32)[None, :]
    g = f @ tmpl.astype(jnp.float32).reshape(c, d).T  # [P, C]
    gram = f @ f.T  # [P, P]

    t = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5
    ys = centers[:, 1:2] + sizes[:, 1:2] * t[None, :]  # [N, K]
    xs = centers[:, 0:1] + sizes[:, 0:1] * t[None, :]
    wy = hat_weights(ys, gh)  # [N, K, Gh]
    wx = hat_weights(xs, gw)  # [N, K, Gw]
    w2 = jnp.einsum("nkr,njc->nkjrc", wy, wx).reshape(n, c, p)  # [N, C, P]
    dot = jnp.einsum("ncp,pc->nc", w2, g)  # [N, C] cell·template
    u = jnp.einsum("ncp,pq->ncq", w2, gram)  # [N, C, P]
    nrm2 = jnp.einsum("ncp,ncp->nc", u, w2)  # [N, C] |cell|^2
    # eps placement matches l2_normalize: v/(|v| + 1e-8).
    cos_c = dot / (jnp.sqrt(jnp.maximum(nrm2, 0.0)) + 1e-8)
    return jnp.mean(cos_c, axis=-1)


def roi_pool_cos_mxu(
    feat: jax.Array,  # [Gh, Gw, D] window token features
    mean_emb: jax.Array | None,  # [D] window-mean embedding (None = no centering)
    tmpl: jax.Array,  # [D] L2-normalized pooled template
    centers: jax.Array,  # [N, 2] grid coords (x, y)
    sizes: jax.Array,  # [N, 2] grid units (w, h)
    grid: int,
) -> jax.Array:
    """Fused pooled-template cosine scores -> [N].

    Numerically equivalent (up to sum reordering) to
        emb = roi_pool_mxu(feat, centers, sizes, K)      # [N, D]
        cos = <l2_normalize(emb - mean_emb), tmpl>
    but WITHOUT the [N, Gw*D] intermediate roi_pool_mxu materializes (at
    eval-5 scale — 16k particles, ViT-L D=1024 — that intermediate is
    ~940 MB of f32 HBM traffic per step and dominated the 8.8 ms device
    step; round-3 VERDICT weak #5). Same Gram trick as roi_cells_cos_mxu
    with ONE pooled cell: the cosine needs only the pooled row's
    dot-with-template and L2 norm, both bilinear in the averaged hat
    weights w [N, P] (P = Gh*Gw tokens), so D collapses into a per-frame
    template projection g = F'·tmpl [P] and token Gram H = F'·F'ᵀ [P, P].
    Per-particle work is then [N, P] x [P, P] — the big intermediate is
    [N, P] (12.8 MB at eval 5) instead of [N, Gw*D].

    Centering commutes into F' because averaged hat-weight rows sum to 1
    (partition of unity, including at clamped edges).
    """
    gh, gw, d = feat.shape
    n = centers.shape[0]
    p = gh * gw
    f = feat.astype(jnp.float32).reshape(p, d)
    if mean_emb is not None:
        f = f - mean_emb.astype(jnp.float32)[None, :]
    g = f @ tmpl.astype(jnp.float32)  # [P] token·template
    gram = f @ f.T  # [P, P]

    t = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5
    ys = centers[:, 1:2] + sizes[:, 1:2] * t[None, :]  # [N, K]
    xs = centers[:, 0:1] + sizes[:, 0:1] * t[None, :]
    ay = jnp.mean(hat_weights(ys, gh), axis=1)  # [N, Gh]
    ax = jnp.mean(hat_weights(xs, gw), axis=1)  # [N, Gw]
    w = jnp.einsum("nr,nc->nrc", ay, ax).reshape(n, p)  # [N, P]
    dot = w @ g  # [N] pooled·template
    u = w @ gram  # [N, P]
    nrm2 = jnp.sum(u * w, axis=-1)  # [N] |pooled|^2
    # eps placement matches l2_normalize: v/(|v| + 1e-8).
    return dot / (jnp.sqrt(jnp.maximum(nrm2, 0.0)) + 1e-8)


def roi_pool_mxu(
    feat: jax.Array,  # [Gh, Gw, D]
    centers: jax.Array,  # [N, 2] grid coords (x, y)
    sizes: jax.Array,  # [N, 2] grid units (w, h)
    grid: int,
) -> jax.Array:
    """roi_pool lowered to two matmuls via hat_weights (no gathers).

    ROI-align MEAN pooling is separable: bilinear(y, x) factorizes as
    hat(y)·hat(x), so

        mean_{k,j} sum_{r,c} Wy[n,k,r] Wx[n,j,c] feat[r,c]
      = sum_{r,c} (mean_k Wy[n,k,r]) (mean_j Wx[n,j,c]) feat[r,c]

    and the KxK sample grid collapses into per-axis AVERAGED hat weights —
    identical values to sampling all K² points, at O(N·Gh·Gw·D) instead of
    O(N·K·Gh·Gw·D). K only shapes the averaging windows (it is otherwise
    free), so dense-mode cost is independent of roi_grid: at 16k particles
    on a 14x14x768 ViT-B grid this is ~5 GFLOP/frame instead of ~200.
    """
    gh, gw, d = feat.shape
    n = centers.shape[0]
    t = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5
    ys = centers[:, 1:2] + sizes[:, 1:2] * t[None, :]  # [N, K]
    xs = centers[:, 0:1] + sizes[:, 0:1] * t[None, :]
    ay = jnp.mean(hat_weights(ys, gh), axis=1)  # [N, Gh]
    ax = jnp.mean(hat_weights(xs, gw), axis=1)  # [N, Gw]
    s1 = ay @ feat.astype(jnp.float32).reshape(gh, gw * d)  # [N, Gw*D]
    return jnp.einsum("nc,ncd->nd", ax, s1.reshape(n, gw, d))
