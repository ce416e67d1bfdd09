"""Flash-attention kernel vs. XLA reference (SURVEY.md §4.2).

On CPU the Pallas kernel runs in interpret mode (slow — sizes kept small);
on TPU it compiles for real. f32 comparisons pin HIGHEST matmul precision on
both sides (this JAX build's DEFAULT precision is bf16-class); bf16 uses the
production default path with a correspondingly loose tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.ops.attention import (
    flash_attention,
    multi_head_attention,
    reference_attention,
)

INTERPRET = jax.default_backend() != "tpu"
HIGHEST = jax.lax.Precision.HIGHEST


# All t >= 128: flash_attention routes t < 128 to the reference lowering
# outright (one padded MXU tile — nothing to stream), so smaller cases
# would compare the reference against itself. The fallback has its own
# test below.
@pytest.mark.parametrize("t,d", [(128, 32), (197, 64), (130, 32), (389, 64)])
def test_flash_matches_reference_f32(t, d):
    key = jax.random.key(t * 100 + d)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (1, 2, t, d)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    got = flash_attention(q, k, v, interpret=INTERPRET, precision=HIGHEST,
                          block_q=128, block_k=128)
    want = reference_attention(q, k, v, precision=HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_matches_reference_bf16():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (1, 2, 197, 64)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    got = np.asarray(flash_attention(q, k, v, interpret=INTERPRET), np.float32)
    want = np.asarray(reference_attention(q, k, v), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_flash_extreme_logits_stable():
    """Online softmax must survive large logits (f32 exp overflow territory).
    t = 256 so the PALLAS kernel runs (t < 128 short-circuits to the
    reference path and would test nothing)."""
    q = jnp.full((1, 1, 256, 32), 30.0, jnp.float32)
    k = jnp.full((1, 1, 256, 32), 30.0, jnp.float32)
    v = jax.random.normal(jax.random.key(1), (1, 1, 256, 32), jnp.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=INTERPRET, precision=HIGHEST))
    assert np.all(np.isfinite(got))
    want = np.asarray(reference_attention(q, k, v, precision=HIGHEST))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multi_kv_block_equivalence():
    """Online-softmax recurrence across k blocks == single-block softmax."""
    key = jax.random.key(5)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (1, 1, 256, 32)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    multi = flash_attention(q, k, v, interpret=INTERPRET, precision=HIGHEST,
                            block_q=128, block_k=64)
    single = flash_attention(q, k, v, interpret=INTERPRET, precision=HIGHEST,
                             block_q=256, block_k=256)
    np.testing.assert_allclose(
        np.asarray(multi), np.asarray(single), rtol=2e-5, atol=2e-5
    )


def test_short_sequence_uses_reference_path():
    """t < 128 must return the reference lowering (the
    degenerate single-tile pallas grid once faulted the TPU worker)."""
    key = jax.random.key(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, 17, 32), jnp.float32)
    k = jax.random.normal(kk, (2, 3, 17, 32), jnp.float32)
    v = jax.random.normal(kv, (2, 3, 17, 32), jnp.float32)
    got = flash_attention(q, k, v, interpret=INTERPRET, precision=HIGHEST)
    want = reference_attention(q, k, v, precision=HIGHEST)
    # Same lowering either side of flash_attention's jit boundary — only
    # fusion-order noise apart.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dispatch_falls_back_off_tpu():
    q = jax.random.normal(jax.random.key(0), (1, 1, 8, 16))
    out = multi_head_attention(q, q, q, use_flash=True)
    want = reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)
