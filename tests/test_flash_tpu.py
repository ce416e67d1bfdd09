"""On-TPU smoke tests for the Pallas flash-attention kernel (B5).

The CPU suite exercises the kernel only in interpret mode, and no shipped
eval config crosses the flash dispatch gate (ops/attention.py
FLASH_MIN_LOGITS_ELEMS) — its production shapes are global-frame encodes.
Without a hardware exercise the kernel could rot unnoticed (round-2 VERDICT
weak #4). Run:

    VPT_TEST_BACKEND=tpu python -m pytest tests/test_flash_tpu.py -q

Skipped automatically in the default forced-CPU suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.ops.attention import (
    flash_attention,
    reference_attention,
)

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU smoke (set VPT_TEST_BACKEND=tpu)",
)


def _qkv(b, h, t, d, dtype, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return [jax.random.normal(k, (b, h, t, d), dtype) for k in ks]


def test_flash_matches_reference_multiblock_bf16():
    # 1080p-encode-like shape: T spans multiple 1024 k/v blocks.
    q, k, v = _qkv(1, 4, 2500, 64, jnp.bfloat16)
    got = np.asarray(flash_attention(q, k, v), np.float32)
    want = np.asarray(reference_attention(q, k, v), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_flash_matches_reference_f32():
    q, k, v = _qkv(2, 2, 384, 64, jnp.float32, seed=1)
    got = np.asarray(flash_attention(q, k, v))
    want = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
