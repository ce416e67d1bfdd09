"""Dense window appearance embedder — shared by tracking AND training.

This is the tracker's flagship appearance path (SURVEY.md §1.2, dense mode):
ONE ViT forward on the search window, then per-box embeddings ROI-pooled
from the token feature grid, so all N particle hypotheses share a single
forward pass per frame (BASELINE.json:5).

It lives in its own module (not inside runtime/tracker.py's closure) so the
feature trainer (training/) differentiates through the EXACT code the
tracker runs at inference — same window extraction, same ROI pooling, same
window-mean centering. Train/serve skew in the embedding path would silently
waste the learned features.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.models.vit import VitSpec, vit_forward_tokens
from vitparticlefiltertracker_tpu.ops.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    extract_window_mxu,
    frame_to_window_coords,
    roi_cells_mxu,
    roi_pool_mxu,
)
from vitparticlefiltertracker_tpu.ops.likelihood import center_embeddings


class DenseEmbedSpec(NamedTuple):
    """Static configuration of the dense appearance embedder."""

    vit: VitSpec  # resolved ViT spec (use_pos_embed must be False — see VitSpec)
    s_img: int  # window resolution fed to the ViT
    patch: int  # ViT patch size
    appearance: str  # "pooled" | "cells" (config.TrackerConfig.appearance)
    roi_grid: int  # KxK ROI-align samples per box
    center_features: bool  # subtract window-mean embedding

    @classmethod
    def from_config(cls, cfg) -> "DenseEmbedSpec":
        """Build from a full Config for tracker.mode == 'dense'."""
        spec = VitSpec.from_config(cfg.model)
        # Translation-equivariant features for ROI pooling (see VitSpec:
        # the window is centered on the previous estimate, so positional
        # embeddings would let the tracker self-confirm and drift).
        spec = spec._replace(use_pos_embed=False)
        t = cfg.tracker
        return cls(
            vit=spec,
            s_img=cfg.model.image_size,
            patch=cfg.model.patch_size,
            appearance=t.appearance,
            roi_grid=t.roi_grid,
            center_features=t.center_features,
        )


def normalize_window(window_raw: jax.Array) -> jax.Array:
    """Normalize an already-extracted uint8-valued float window.

    Normalization is affine, so it commutes with bilinear sampling — doing it
    after extraction touches S*S px instead of the whole frame.
    """
    mean = jnp.asarray(IMAGENET_MEAN, window_raw.dtype) * 255.0
    std = jnp.asarray(IMAGENET_STD, window_raw.dtype) * 255.0
    return (window_raw - mean) / std


def make_dense_embedder(
    prm: dict,
    frame_f32: jax.Array,  # [H, W, 3] float (0..255 scale)
    center: jax.Array,  # [2] (x, y) search-window center, frame px
    side: jax.Array,  # [] window side, frame px
    es: DenseEmbedSpec,
) -> Callable:
    """One ViT forward on the search window; the returned pool() ROI-pools
    any number of box sets from the token grid.

    pool(boxes_xy [M, 2] frame-px centers, boxes_wh [M, 2] frame-px sizes)
      -> (embeddings [M, D] or [M, K*K, D], in_window [M] bool)

    The per-frame work (window extraction + ViT forward) is computed ONCE
    per frame *by construction*, however many box sets are embedded
    (particles, then the template-EMA estimate) — not left to XLA CSE.
    """
    spec = es.vit
    s_img, patch = es.s_img, es.patch
    grid = s_img // patch
    window = normalize_window(extract_window_mxu(frame_f32, center, side, s_img))
    feat = vit_forward_tokens(prm, window[None], spec)[0]
    feat = feat.reshape(grid, grid, spec.dim)
    # Window's shared-context component (see ops/likelihood.py:
    # center_embeddings) — template and particles are centered by the same
    # window mean, so cosines compare appearance, not global image stats.
    mean_emb = jnp.mean(feat.reshape(-1, spec.dim), axis=0)

    def pool(boxes_xy: jax.Array, boxes_wh: jax.Array):
        win_px = frame_to_window_coords(boxes_xy, center, side, s_img)
        gxy = (win_px - (patch - 1) / 2.0) / patch  # feature-grid coords
        gwh = boxes_wh / side * s_img / patch
        if es.appearance == "cells":
            k = es.roi_grid
            emb = roi_cells_mxu(feat, gxy, gwh, k)  # [M, K, K, D]
            emb = emb.reshape(emb.shape[0], k * k, spec.dim)
        else:
            emb = roi_pool_mxu(feat, gxy, gwh, es.roi_grid)  # [M, D]
        if es.center_features:
            emb = center_embeddings(emb, mean_emb)
        in_win = jnp.all((win_px >= 0) & (win_px <= s_img - 1), axis=-1)
        return emb, in_win

    return pool
