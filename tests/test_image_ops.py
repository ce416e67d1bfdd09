"""Vision-op equivalence: MXU (hat-weight matmul) paths vs gather reference.

SURVEY.md §4.2: "gather+patchify kernel vs. naive dynamic_slice+reshape" —
the matmul lowering must reproduce the gather-based bilinear semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.ops.image import (
    bilinear_sample,
    extract_window,
    extract_window_mxu,
    frame_to_window_coords,
    hat_weights,
    roi_pool,
    roi_pool_mxu,
)
from vitparticlefiltertracker_tpu.ops.patchify import (
    extract_crops,
    extract_crops_mxu,
    gather_patchify,
)


def rand_img(key, h=64, w=80, c=3):
    return jax.random.uniform(key, (h, w, c), jnp.float32) * 255.0


def test_hat_weights_rows_sum_to_one():
    w = hat_weights(jnp.asarray([0.0, 3.7, 62.2, 63.0, 99.0]), 64)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-6)
    # interior row has exactly the lerp weights
    row = np.asarray(w[1])
    assert abs(row[3] - 0.3) < 1e-6 and abs(row[4] - 0.7) < 1e-6


def test_extract_window_mxu_matches_gather():
    img = rand_img(jax.random.key(0))
    center = jnp.asarray([33.3, 27.9])
    side = jnp.float32(41.5)
    a = extract_window(img, center, side, 32)
    b = extract_window_mxu(img, center, side, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3)


def test_extract_window_mxu_edge_clamp():
    img = rand_img(jax.random.key(1))
    center = jnp.asarray([2.0, 62.0])  # window hangs off the frame edges
    side = jnp.float32(30.0)
    a = extract_window(img, center, side, 16)
    b = extract_window_mxu(img, center, side, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3)


def test_roi_pool_mxu_matches_gather():
    key = jax.random.key(2)
    feat = jax.random.normal(key, (14, 14, 32), jnp.float32)
    n = 17
    centers = jax.random.uniform(jax.random.key(3), (n, 2), minval=0.0, maxval=13.0)
    sizes = jax.random.uniform(jax.random.key(4), (n, 2), minval=0.5, maxval=4.0)
    a = roi_pool(feat, centers, sizes, 3)
    b = roi_pool_mxu(feat, centers, sizes, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_extract_crops_mxu_matches_gather():
    img = rand_img(jax.random.key(5), h=128, w=160)
    n = 9
    centers = jnp.stack(
        [
            jax.random.uniform(jax.random.key(6), (n,), minval=20.0, maxval=140.0),
            jax.random.uniform(jax.random.key(7), (n,), minval=20.0, maxval=108.0),
        ],
        axis=1,
    )
    sizes = jnp.full((n, 2), 24.0)
    a = extract_crops(img, centers, sizes, 16)
    b = extract_crops_mxu(img, centers, sizes, 16, region=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3)


def test_extract_crops_mxu_frame_edge():
    """Boxes at the frame border: region clamps, samples clamp to edge."""
    img = rand_img(jax.random.key(8), h=96, w=96)
    centers = jnp.asarray([[2.0, 2.0], [94.0, 50.0], [50.0, 95.0]])
    sizes = jnp.full((3, 2), 20.0)
    a = extract_crops(img, centers, sizes, 16)
    b = extract_crops_mxu(img, centers, sizes, 16, region=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3)


def test_gather_patchify_token_layout():
    """Embedded tokens == patchify(resampled crop) @ kernel, row-major grid."""
    img = rand_img(jax.random.key(9), h=64, w=64)
    kernel = jax.random.normal(jax.random.key(10), (8 * 8 * 3, 16), jnp.float32) * 0.01
    bias = jnp.zeros((16,))
    centers = jnp.asarray([[30.0, 30.0]])
    sizes = jnp.asarray([[16.0, 16.0]])
    toks = gather_patchify(img, centers, sizes, 16, 8, kernel, bias, region=32)
    assert toks.shape == (1, 4, 16)
    crop = extract_crops_mxu(img, centers, sizes, 16, region=32)[0]
    want = crop[:8, :8].reshape(-1) @ kernel  # token 0 = top-left patch
    np.testing.assert_allclose(np.asarray(toks[0, 0]), np.asarray(want), rtol=1e-4, atol=1e-3)


def test_frame_to_window_roundtrip():
    center = jnp.asarray([50.0, 60.0])
    side = jnp.float32(77.0)
    pts = jnp.asarray([[50.0, 60.0], [30.0, 40.0], [88.0, 98.0]])
    win = frame_to_window_coords(pts, center, side, 128)
    # center maps to window center
    np.testing.assert_allclose(np.asarray(win[0]), [63.5, 63.5], atol=1e-4)
    # window_grid(i) at win coord should return the original frame coord
    back = center + side * ((win + 0.5) / 128.0 - 0.5)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-5)


def test_roi_cells_cos_fused_matches_reference():
    """roi_cells_cos_mxu == roi_cells_mxu -> center -> per-cell-normalized
    mean cosine (the fused hot path must be a pure reordering of sums)."""
    from vitparticlefiltertracker_tpu.ops.image import roi_cells_cos_mxu, roi_cells_mxu
    from vitparticlefiltertracker_tpu.ops.likelihood import (
        _cos_to_template,
        center_embeddings,
        l2_normalize,
    )

    key = jax.random.key(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    gh = gw = 14
    d = 64
    grid = 3
    n = 37
    feat = jax.random.normal(k1, (gh, gw, d), jnp.float32)
    mean_emb = jnp.mean(feat.reshape(-1, d), axis=0)
    tmpl = l2_normalize(jax.random.normal(k2, (grid * grid, d), jnp.float32))
    # centers spanning interior AND clamped edges; varied sizes
    centers = jax.random.uniform(k3, (n, 2), minval=-2.0, maxval=15.0)
    sizes = jax.random.uniform(k4, (n, 2), minval=0.5, maxval=6.0)

    for me in (mean_emb, None):
        cells = roi_cells_mxu(feat, centers, sizes, grid).reshape(n, grid * grid, d)
        if me is not None:
            cells = center_embeddings(cells, me)
        want = _cos_to_template(cells, tmpl)
        got = roi_cells_cos_mxu(feat, me, tmpl, centers, sizes, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_roi_pool_cos_fused_matches_reference():
    """roi_pool_cos_mxu == roi_pool_mxu -> center -> normalized cosine (the
    pooled hot path must be a pure reordering of sums — it is what keeps the
    [N, Gw*D] pooled intermediate out of HBM at 16k particles)."""
    from vitparticlefiltertracker_tpu.ops.image import roi_pool_cos_mxu
    from vitparticlefiltertracker_tpu.ops.likelihood import (
        _cos_to_template,
        center_embeddings,
        l2_normalize,
    )

    key = jax.random.key(12)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    gh = gw = 14
    d = 64
    grid = 5
    n = 41
    feat = jax.random.normal(k1, (gh, gw, d), jnp.float32)
    mean_emb = jnp.mean(feat.reshape(-1, d), axis=0)
    tmpl = l2_normalize(jax.random.normal(k2, (d,), jnp.float32))
    # centers spanning interior AND clamped edges; varied sizes
    centers = jax.random.uniform(k3, (n, 2), minval=-2.0, maxval=15.0)
    sizes = jax.random.uniform(k4, (n, 2), minval=0.5, maxval=6.0)

    for me in (mean_emb, None):
        emb = roi_pool_mxu(feat, centers, sizes, grid)
        if me is not None:
            emb = center_embeddings(emb, me)
        want = _cos_to_template(emb, tmpl)
        got = roi_pool_cos_mxu(feat, me, tmpl, centers, sizes, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_dense_pooled_score_matches_pool_path():
    """score_from_feat(appearance='pooled') == pool_from_feat + cosine, with
    and without a residual-head split (the tracker's dense-pooled hot path
    switched to the fused scorer; this pins the equivalence end-to-end at
    the embedder level, split blending included)."""
    from vitparticlefiltertracker_tpu.models.embedder import (
        DenseEmbedSpec,
        pool_from_feat,
        score_from_feat,
    )
    from vitparticlefiltertracker_tpu.models.vit import VitSpec
    from vitparticlefiltertracker_tpu.ops.likelihood import (
        _cos_to_template,
        l2_normalize_split,
    )

    key = jax.random.key(13)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 29
    center = jnp.asarray([160.0, 120.0])
    side = jnp.float32(96.0)
    boxes_xy = center[None] + jax.random.uniform(k3, (n, 2), minval=-60.0, maxval=60.0)
    boxes_wh = jax.random.uniform(k4, (n, 2), minval=8.0, maxval=40.0)

    for head_depth, d_out in ((0, 48), (2, 96)):
        spec = VitSpec(
            depth=1, dim=48, heads=4, mlp_dim=96, patch_size=16, image_size=64,
            use_pos_embed=False, head_depth=head_depth,
        )
        es = DenseEmbedSpec(
            vit=spec, s_img=64, patch=16, appearance="pooled", roi_grid=3,
            center_features=True, head_blend=0.5,
        )
        feat = jax.random.normal(k1, (4, 4, d_out), jnp.float32)
        mean_emb = jnp.mean(feat.reshape(-1, d_out), axis=0)
        tmpl = l2_normalize_split(
            jax.random.normal(k2, (d_out,), jnp.float32), es.split
        )
        emb, in_ref = pool_from_feat(feat, mean_emb, center, side, es, boxes_xy, boxes_wh)
        want = _cos_to_template(emb, tmpl, es.split)
        got, in_win = score_from_feat(
            feat, mean_emb, center, side, es, tmpl, boxes_xy, boxes_wh
        )
        np.testing.assert_array_equal(np.asarray(in_win), np.asarray(in_ref))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
