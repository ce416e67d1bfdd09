"""Multi-head attention for the ViT: Pallas flash-attention + XLA fallback.

Component B5 (SURVEY.md §2.2): the ViT encoder's attention runs as a fused
Pallas TPU kernel implementing the FlashAttention online-softmax recurrence
(blocked over query/key tiles, statistics carried in VMEM, one pass over
HBM). On non-TPU backends — and for shapes too small to benefit — it falls
back to a plain XLA attention, which the kernel is unit-tested against
(tolerance per SURVEY.md §4.2).

ViT tracking sequences are short (197–1k tokens), so the kernel's win is not
memory (everything fits VMEM) but fusion: one kernel instead of four XLA
HLOs keeps the [B*H, T, T] logits tensor out of HBM entirely when B*H*T*T is
large (1k particle crops x 12 heads).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; import is safe everywhere.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, precision=None
) -> jax.Array:
    """Plain XLA attention. q,k,v: [..., T, d]. Softmax in f32 for stability."""
    d = q.shape[-1]
    logits = jnp.einsum("...qd,...kd->...qk", q, k, precision=precision)
    logits = logits.astype(jnp.float32) / math.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v, precision=precision)


# ---------------------------------------------------------------------------
# Pallas flash-attention kernel
# ---------------------------------------------------------------------------

def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int, scale: float, precision
):
    """One (batch*head, q-block) program: online softmax over k/v blocks.

    q_ref: [1, block_q, d]; k_ref/v_ref: [1, T_pad, d] (whole sequence for
    this head, resident in VMEM — ViT sequences are short); o_ref like q_ref.
    Padding keys (index >= kv_len) are masked to -inf before the softmax.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    t_pad = k_ref.shape[1]
    num_kb = t_pad // block_k

    def body(ib, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(ib * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(ib * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [block_q, block_k]
        col = ib * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "precision")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    precision=None,
) -> jax.Array:
    """FlashAttention on TPU. q,k,v: [B, H, T, d] -> [B, H, T, d].

    Grid: (B*H, ceil(T/block_q)); each program streams k/v blocks of its head
    through the MXU with the online-softmax recurrence, so the T x T logits
    matrix never materializes. d and T are padded to lane/tile multiples;
    padded keys are masked inside the kernel, padded queries are sliced off.
    """
    b, h, t, d = q.shape
    dtype = q.dtype
    scale = 1.0 / math.sqrt(d)

    t_pad = _round_up(t, max(block_q, block_k))
    d_pad = _round_up(d, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))

    qp = pad(q).reshape(b * h, t_pad, d_pad)
    kp = pad(k).reshape(b * h, t_pad, d_pad)
    vp = pad(v).reshape(b * h, t_pad, d_pad)

    grid = (b * h, t_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, kv_len=t, block_k=block_k, scale=scale, precision=precision
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, t_pad, d_pad)[:, :, :t, :d]


# Measured crossover on v5e (2026-08): XLA's fused attention wins at
# tracking's short sequences (196-token windows: flash is ~20% slower from
# d 64->128 lane padding + program overhead) and stays ahead through
# T=4096 (11.2 vs 14.5 ms at B=1,H=16); at T=8192 the materialized
# [B, H, T, T] logits blow past HBM-friendly sizes and XLA collapses
# (1934 ms vs flash's 121 ms — 16x). Gate on the logits element count, the
# quantity that actually explodes. Global-frame encodes (1080p ~ 8.1k
# tokens) land squarely in the flash regime.
#
# The gate sees EXECUTED logits: callers under vmap (banked / multistream
# trackers — runtime/banked.py) pass their mapped bank/stream count as
# `batch_hint`, since tracing shapes don't show the mapped axis. The
# threshold keeps a 5x margin below the measured single-example crossover
# for unhinted callers; per-shape measurements live in
# docs/bench_attention.jsonl (tools/bench_attention.py).
FLASH_MIN_LOGITS_ELEMS = 1e8


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    use_flash: bool = True,
    batch_hint: int = 1,
) -> jax.Array:
    """Dispatch: Pallas flash kernel on TPU when the EXECUTED [B, H, T, T]
    logits tensor is large enough to dominate, XLA reference attention
    otherwise. batch_hint: static multiplier for batch axes invisible at
    trace time (outer vmap over banks/streams)."""
    b_h = max(1, batch_hint)
    for s in q.shape[:-2]:
        b_h *= s
    t = q.shape[-2]
    if (
        use_flash
        and jax.default_backend() == "tpu"
        and b_h * t * t >= FLASH_MIN_LOGITS_ELEMS
    ):
        return flash_attention(q, k, v)
    return reference_attention(q, k, v)
