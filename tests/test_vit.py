"""ViT backbone unit tests: shapes, determinism, pooling, precision."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.models.vit import (
    VitSpec,
    init_vit_params,
    param_count,
    patchify,
    vit_embed,
    vit_forward_tokens,
)

TINY = VitSpec(depth=2, dim=64, heads=4, mlp_dim=128, patch_size=16,
               image_size=64, dtype=jnp.float32, use_flash_attention=False)


def test_patchify_shapes_and_content():
    imgs = jnp.arange(2 * 32 * 32 * 3, dtype=jnp.float32).reshape(2, 32, 32, 3)
    toks = patchify(imgs, 16)
    assert toks.shape == (2, 4, 16 * 16 * 3)
    # First token of first image == top-left 16x16 patch, row-major.
    want = np.asarray(imgs[0, :16, :16, :]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(toks[0, 0]), want)


def test_forward_shapes():
    key = jax.random.key(0)
    params = init_vit_params(key, TINY)
    imgs = jax.random.normal(jax.random.key(1), (3, 64, 64, 3))
    toks = vit_forward_tokens(params, imgs, TINY)
    assert toks.shape == (3, 16, 64)
    emb = vit_embed(params, imgs, TINY)
    assert emb.shape == (3, 64)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_cls_token_pooling():
    spec = TINY._replace(use_cls_token=True, pooling="cls")
    params = init_vit_params(jax.random.key(0), spec)
    imgs = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    toks = vit_forward_tokens(params, imgs, spec)
    assert toks.shape == (2, 17, 64)  # +1 cls
    emb = vit_embed(params, imgs, spec)
    assert emb.shape == (2, 64)


def test_param_count_vit_b16():
    spec = VitSpec()  # vit-b16 defaults
    params = init_vit_params(jax.random.key(0), spec)
    n = param_count(params)
    # ViT-B/16 ~ 86M (no classifier head, no cls token here).
    assert 80e6 < n < 92e6, n


def test_jit_eager_equivalence():
    params = init_vit_params(jax.random.key(0), TINY)
    imgs = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    a = vit_embed(params, imgs, TINY)
    b = jax.jit(vit_embed, static_argnames="spec")(params, imgs, TINY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_batch_independence():
    """Each image's embedding is independent of the rest of the batch."""
    params = init_vit_params(jax.random.key(0), TINY)
    imgs = jax.random.normal(jax.random.key(1), (4, 64, 64, 3))
    full = np.asarray(vit_embed(params, imgs, TINY))
    solo = np.asarray(vit_embed(params, imgs[2:3], TINY))
    np.testing.assert_allclose(full[2], solo[0], rtol=0, atol=1e-4)


def test_bf16_close_to_f32():
    spec32 = TINY
    spec16 = TINY._replace(dtype=jnp.bfloat16)
    params = init_vit_params(jax.random.key(0), spec32)
    imgs = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    e32 = np.asarray(vit_embed(params, imgs, spec32), np.float32)
    e16 = np.asarray(vit_embed(params, imgs, spec16), np.float32)
    # cosine similarity per row
    cos = (e32 * e16).sum(-1) / (
        np.linalg.norm(e32, axis=-1) * np.linalg.norm(e16, axis=-1)
    )
    assert np.all(cos > 0.99), cos
