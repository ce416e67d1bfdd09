"""Pallas fused gather+patchify kernel vs. the XLA reference path.

SURVEY.md §4.2: "gather+patchify kernel vs. naive dynamic_slice+reshape"
unit tests. The kernel runs in interpret mode on CPU (tests/conftest.py
forces the CPU backend); on-TPU lowering is exercised by the benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.ops.patchify_pallas import (
    gather_patchify_window_pallas,
    window_gather_patchify_xla,
)

SWIN, CROP, PATCH, C, D = 64, 32, 16, 3, 128


def _setup(seed=0, n=13, swin=SWIN, d=D):
    rng = np.random.default_rng(seed)
    window = jnp.asarray(rng.normal(size=(swin, swin, C)).astype(np.float32))
    centers = jnp.asarray(
        rng.uniform(8.0, swin - 8.0, size=(n, 2)).astype(np.float32)
    )
    sizes = jnp.asarray(rng.uniform(6.0, 24.0, size=(n, 2)).astype(np.float32))
    kernel = jnp.asarray(
        (rng.normal(size=(PATCH * PATCH * C, d)) * 0.02).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    return window, centers, sizes, kernel, bias


def test_kernel_matches_xla_reference():
    window, centers, sizes, kernel, bias = _setup()
    ref = window_gather_patchify_xla(window, centers, sizes, CROP, PATCH, kernel, bias)
    out = gather_patchify_window_pallas(
        window, centers, sizes, CROP, PATCH, kernel, bias, interpret=True
    )
    assert out.shape == ref.shape == (13, 4, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_kernel_ragged_block_padding():
    """N not a multiple of block_n: padded particles must not leak into out."""
    window, centers, sizes, kernel, bias = _setup(n=5)
    out = gather_patchify_window_pallas(
        window, centers, sizes, CROP, PATCH, kernel, bias, block_n=4, interpret=True
    )
    ref = window_gather_patchify_xla(window, centers, sizes, CROP, PATCH, kernel, bias)
    assert out.shape == (5, 4, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_kernel_edge_clamp():
    """Boxes hanging past the window edge clamp-to-edge like the reference."""
    window, _, _, kernel, bias = _setup()
    centers = jnp.asarray([[1.0, 1.0], [SWIN - 2.0, SWIN - 2.0]], jnp.float32)
    sizes = jnp.asarray([[20.0, 20.0], [20.0, 20.0]], jnp.float32)
    ref = window_gather_patchify_xla(window, centers, sizes, CROP, PATCH, kernel, bias)
    out = gather_patchify_window_pallas(
        window, centers, sizes, CROP, PATCH, kernel, bias, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_kernel_bf16_embed_close():
    window, centers, sizes, kernel, bias = _setup(n=4)
    ref = window_gather_patchify_xla(window, centers, sizes, CROP, PATCH, kernel, bias)
    out = gather_patchify_window_pallas(
        window,
        centers,
        sizes,
        CROP,
        PATCH,
        kernel.astype(jnp.bfloat16),
        bias.astype(jnp.bfloat16),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.05
    )


@pytest.mark.parametrize("crop,patch", [(32, 16), (48, 16)])
def test_kernel_grid_sizes(crop, patch):
    g2 = (crop // patch) ** 2
    window, centers, sizes, kernel, bias = _setup(n=3)
    out = gather_patchify_window_pallas(
        window, centers, sizes, crop, patch, kernel, bias, interpret=True
    )
    ref = window_gather_patchify_xla(window, centers, sizes, crop, patch, kernel, bias)
    assert out.shape == (3, g2, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
