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
    FrameView,
    frame_to_window_coords,
    full_view,
    roi_cells_cos_mxu,
    roi_cells_mxu,
    roi_pool_cos_mxu,
    roi_pool_mxu,
    view_extract_window_mxu,
)


from vitparticlefiltertracker_tpu.ops.likelihood import center_embeddings


def _as_view(frame) -> FrameView:
    """Accept a raw [H, W, 3] float frame or a FrameView (ROI streaming)."""
    return frame if isinstance(frame, FrameView) else full_view(frame)


class DenseEmbedSpec(NamedTuple):
    """Static configuration of the dense appearance embedder."""

    vit: VitSpec  # resolved ViT spec (use_pos_embed must be False — see VitSpec)
    s_img: int  # window resolution fed to the ViT
    patch: int  # ViT patch size
    appearance: str  # "pooled" | "cells" (config.TrackerConfig.appearance)
    roi_grid: int  # KxK ROI-align samples per box
    center_features: bool  # subtract window-mean embedding
    head_blend: float = 0.5  # b in (1-b)*cos_trunk + b*cos_head (head only)

    @property
    def split(self) -> tuple[int, float] | None:
        """(d_trunk, blend) when the residual head is on, else None.

        Passed to ops/likelihood.py's split-aware cosines: token features
        are concat(trunk, head) [.., 2*dim] and the appearance score blends
        the two halves' cosines (VitSpec.head_depth)."""
        if self.vit.head_depth > 0:
            return (self.vit.dim, self.head_blend)
        return None

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
            head_blend=cfg.model.head_blend,
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
    frame_f32,  # [H, W, 3] float (0..255 scale) or FrameView (ROI stream)
    center: jax.Array,  # [2] (x, y) search-window center, frame px
    side: jax.Array,  # [] window side, frame px
    es: DenseEmbedSpec,
    *,
    remat: bool = False,
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
    s_img = es.s_img
    grid = s_img // es.patch
    window = normalize_window(
        view_extract_window_mxu(_as_view(frame_f32), center, side, s_img)
    )
    fwd = lambda p, w: vit_forward_tokens(p, w[None], spec)[0]
    if remat:
        # Rematerialize the window forward on the backward pass (training
        # only — inference never differentiates through the embedder). The
        # objective embeds 3+ windows per sample x batch; without remat the
        # saved per-block activations OOM ViT-B training on a 16G chip.
        fwd = jax.checkpoint(fwd)
    feat = fwd(prm, window)
    feat = feat.reshape(grid, grid, spec.out_dim)
    # Window's shared-context component (see ops/likelihood.py:
    # center_embeddings) — template and particles are centered by the same
    # window mean, so cosines compare appearance, not global image stats.
    mean_emb = jnp.mean(feat.reshape(-1, spec.out_dim), axis=0)

    def pool(boxes_xy: jax.Array, boxes_wh: jax.Array):
        return pool_from_feat(feat, mean_emb, center, side, es, boxes_xy, boxes_wh)

    def score(tmpl: jax.Array, boxes_xy: jax.Array, boxes_wh: jax.Array):
        return score_from_feat(
            feat, mean_emb, center, side, es, tmpl, boxes_xy, boxes_wh
        )

    def score_halves(tmpl: jax.Array, boxes_xy: jax.Array, boxes_wh: jax.Array):
        return score_halves_from_feat(
            feat, mean_emb, center, side, es, tmpl, boxes_xy, boxes_wh
        )

    pool.score = score  # the hot path scores WITHOUT materializing embeddings
    pool.score_halves = score_halves  # (cos_trunk, cos_head) for dynamic blends
    return pool


def pool_from_feat(
    feat: jax.Array,  # [grid, grid, D] window token features
    mean_emb: jax.Array,  # [D] window-mean embedding
    center: jax.Array,  # [2] window center, frame px
    side: jax.Array,  # [] window side, frame px
    es: DenseEmbedSpec,
    boxes_xy: jax.Array,  # [M, 2] box centers, frame px
    boxes_wh: jax.Array,  # [M, 2] box sizes, frame px
):
    """ROI-pool per-box embeddings from an already-computed window feature
    grid. Shared by make_dense_embedder's pool() and the tiled global
    re-detection scan (which batches many windows through one forward)."""
    s_img, patch = es.s_img, es.patch
    win_px = frame_to_window_coords(boxes_xy, center, side, s_img)
    gxy = (win_px - (patch - 1) / 2.0) / patch  # feature-grid coords
    gwh = boxes_wh / side * s_img / patch
    if es.appearance == "cells":
        k = es.roi_grid
        emb = roi_cells_mxu(feat, gxy, gwh, k)  # [M, K, K, D]
        emb = emb.reshape(emb.shape[0], k * k, feat.shape[-1])
    else:
        emb = roi_pool_mxu(feat, gxy, gwh, es.roi_grid)  # [M, D]
    if es.center_features:
        emb = center_embeddings(emb, mean_emb)
    in_win = jnp.all((win_px >= 0) & (win_px <= s_img - 1), axis=-1)
    return emb, in_win


def score_from_feat(
    feat: jax.Array,  # [grid, grid, D] window token features
    mean_emb: jax.Array,  # [D] window-mean embedding
    center: jax.Array,  # [2] window center, frame px
    side: jax.Array,  # [] window side, frame px
    es: DenseEmbedSpec,
    tmpl: jax.Array,  # [K*K, D] (cells) or [D] (pooled) L2-normalized template
    boxes_xy: jax.Array,  # [M, 2] box centers, frame px
    boxes_wh: jax.Array,  # [M, 2] box sizes, frame px
):
    """Fused template cosine scores for M boxes -> (cos [M], in_win [M]).

    The particle-scoring hot path: numerically equivalent to
    pool_from_feat + normalized cosine, but fused so the per-box
    embeddings never reach HBM. appearance == 'cells' uses the structured
    per-cell scorer (ops/image.py:roi_cells_cos_mxu, [M, K, K, D] never
    materialized); 'pooled' uses the single-vector scorer
    (roi_pool_cos_mxu, [M, Gw*D] never materialized — the eval-5 16k-
    particle dominator, round-3 VERDICT weak #5)."""
    s_img, patch = es.s_img, es.patch
    win_px = frame_to_window_coords(boxes_xy, center, side, s_img)
    gxy = (win_px - (patch - 1) / 2.0) / patch
    gwh = boxes_wh / side * s_img / patch
    fused = roi_cells_cos_mxu if es.appearance == "cells" else roi_pool_cos_mxu
    in_win = jnp.all((win_px >= 0) & (win_px <= s_img - 1), axis=-1)
    if es.split is not None:
        # Residual-head features: blend the two halves' fused cosine maps
        # (each half centered/normalized independently — the same semantics
        # as ops/likelihood.py's split _cos_to_template). Two fused calls:
        # the per-particle weight tensors are rebuilt, but the D-dependent
        # Gram/projection maps halve, so the extra cost is the second
        # weights-x-Gram contraction — paid only in head configs.
        d, b = es.split
        mean_f = mean_emb[:d] if es.center_features else None
        mean_h = mean_emb[d:] if es.center_features else None
        cos_f = fused(feat[..., :d], mean_f, tmpl[..., :d], gxy, gwh, es.roi_grid)
        cos_h = fused(feat[..., d:], mean_h, tmpl[..., d:], gxy, gwh, es.roi_grid)
        cos = (1.0 - b) * cos_f + b * cos_h
    else:
        cos = fused(
            feat,
            mean_emb if es.center_features else None,
            tmpl,
            gxy,
            gwh,
            es.roi_grid,
        )
    return cos, in_win


def score_halves_from_feat(
    feat: jax.Array,
    mean_emb: jax.Array,
    center: jax.Array,
    side: jax.Array,
    es: DenseEmbedSpec,
    tmpl: jax.Array,
    boxes_xy: jax.Array,
    boxes_wh: jax.Array,
):
    """score_from_feat's two halves UNBLENDED -> (cos_trunk, cos_head,
    in_win), for callers that apply a dynamic (traced) blend — the automatic
    head-blend policy (config model.head_blend_auto) blends the likelihood
    with a per-step weight while the gates keep the static one. Requires
    es.split (a head). Same fused scorers, same per-half centering/
    normalization semantics as score_from_feat."""
    assert es.split is not None, "score_halves_from_feat needs a head split"
    s_img, patch = es.s_img, es.patch
    win_px = frame_to_window_coords(boxes_xy, center, side, s_img)
    gxy = (win_px - (patch - 1) / 2.0) / patch
    gwh = boxes_wh / side * s_img / patch
    fused = roi_cells_cos_mxu if es.appearance == "cells" else roi_pool_cos_mxu
    d, _ = es.split
    mean_f = mean_emb[:d] if es.center_features else None
    mean_h = mean_emb[d:] if es.center_features else None
    cos_f = fused(feat[..., :d], mean_f, tmpl[..., :d], gxy, gwh, es.roi_grid)
    cos_h = fused(feat[..., d:], mean_h, tmpl[..., d:], gxy, gwh, es.roi_grid)
    in_win = jnp.all((win_px >= 0) & (win_px <= s_img - 1), axis=-1)
    return cos_f, cos_h, in_win


def tiled_window_embed(
    prm: dict,
    frame_f32,  # [H, W, 3] float frame or FrameView (decimated re-detect)
    tile_ctrs: jax.Array,  # [G, 2] tile window centers, frame px
    tile_side: jax.Array,  # [] tile window side, frame px
    es: DenseEmbedSpec,
    cand_xy: jax.Array,  # [G, C, 2] candidate box centers per tile, frame px
    cand_wh: jax.Array,  # [2] candidate box size, frame px
):
    """Embed C candidate boxes in each of G tile windows with ONE batched
    ViT forward (global re-detection, SURVEY.md §5.3).

    Each tile is a window at near-local-search scale, so candidates are
    scored at the SAME resolution the appearance model tracks (and was
    trained) at — a single whole-frame window squeezes a 640px frame into
    224 tokens and starves the features of resolution (the round-2 trained
    checkpoint exposed this: whole-frame re-detection scored garbage).
    Returns (emb [G, C, ...], valid [G, C])."""
    spec = es.vit
    grid = es.s_img // es.patch
    view = _as_view(frame_f32)
    windows = jax.vmap(
        lambda c: normalize_window(
            view_extract_window_mxu(view, c, tile_side, es.s_img)
        )
    )(tile_ctrs)
    feats = vit_forward_tokens(prm, windows, spec)  # [G, T, D or 2D]
    feats = feats.reshape(feats.shape[0], grid, grid, spec.out_dim)
    mean_embs = jnp.mean(feats, axis=(1, 2))  # [G, D]
    wh = jnp.broadcast_to(cand_wh, cand_xy.shape[1:])
    return jax.vmap(
        lambda f, m, ctr, cxy: pool_from_feat(f, m, ctr, tile_side, es, cxy, wh)
    )(feats, mean_embs, tile_ctrs, cand_xy)
