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


def _default_precision(dtype, precision):
    """f32 inputs get true-f32 MXU passes (Precision.HIGHEST).

    On TPU the MXU's default precision truncates f32 operands to bf16-ish
    passes; callers handing us f32 expect f32 math (the 2e-5 test tolerance
    assumes it — round-3 VERDICT weak #1). bf16 inputs keep the fast path.
    """
    if precision is None and dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return precision


def reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, precision=None
) -> jax.Array:
    """Plain XLA attention. q,k,v: [..., T, d]. Softmax in f32 for stability."""
    d = q.shape[-1]
    precision = _default_precision(q.dtype, precision)
    logits = jnp.einsum("...qd,...kd->...qk", q, k, precision=precision)
    logits = logits.astype(jnp.float32) / math.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v, precision=precision)


# ---------------------------------------------------------------------------
# Pallas flash-attention kernel
# ---------------------------------------------------------------------------

def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, kv_len: int, block_k: int, num_kb: int, scale: float, precision,
):
    """One (batch*head, q-block, k-block) program of the online softmax.

    The k/v sequence is STREAMED across the grid's innermost dimension —
    q_ref/o_ref: [1, block_q, d]; k_ref/v_ref: [1, block_k, d] — so VMEM use
    is independent of T (the first all-of-K/V-resident version failed to
    compile at 4K global encodes, T=32.6k: 2x8.4 MB of K/V per head).
    Softmax statistics and the output accumulator live in VMEM scratch,
    carried across the sequential k-block steps; the output block is
    written once, on the last k-block visit. Padding keys (index >= kv_len)
    are masked to -inf before the softmax.
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    # MXU dots run in the INPUT dtype (bf16 in production — 4x the f32
    # MXU rate) with f32 accumulation; softmax statistics stay f32. The
    # scale is applied to the f32 logits, not the bf16 operands.
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) * scale  # [block_q, block_k]
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -jnp.inf)

    m = m_ref[:, :1]
    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == num_kb - 1)
    def _flush():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


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
    block_q: int = 1024,
    block_k: int = 1024,
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
    precision = _default_precision(dtype, precision)

    if t < 128:
        # Below one MXU tile there is nothing to stream — the whole
        # sequence is a single (padded) block and the online-softmax
        # machinery is pure overhead (measured 100x slower than XLA at
        # the 4-token crop shape, and the degenerate grid faulted the TPU
        # worker). The gate never sends such shapes here; direct callers
        # get the reference lowering.
        return reference_attention(q, k, v, precision=precision)
    if pltpu is None:
        # The kernel's online-softmax accumulators live in TPU VMEM
        # scratch; a JAX build without jax.experimental.pallas.tpu cannot
        # allocate them (and has no TPU to run the kernel on anyway).
        return reference_attention(q, k, v, precision=precision)

    # Big blocks win at the global-encode shapes the gate dispatches here
    # (v5e sweep: 27 ms at 128x128 -> 2.6 ms at 1024x1024 for 1080p ViT-B;
    # 2048x2048 exceeds VMEM). Clamp to the padded sequence so small test
    # shapes don't inflate 5x.
    block_q = min(block_q, _round_up(t, 128))
    block_k = min(block_k, _round_up(t, 128))
    t_pad = _round_up(t, math.lcm(block_q, block_k))
    d_pad = _round_up(d, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))

    qp = pad(q).reshape(b * h, t_pad, d_pad)
    kp = pad(k).reshape(b * h, t_pad, d_pad)
    vp = pad(v).reshape(b * h, t_pad, d_pad)

    num_kb = t_pad // block_k
    grid = (b * h, t_pad // block_q, num_kb)
    kernel = functools.partial(
        _flash_kernel, kv_len=t, block_k=block_k, num_kb=num_kb,
        scale=scale, precision=precision,
    )
    scratch = [
        pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        pltpu.VMEM((block_q, 128), jnp.float32),  # running max (lane-bcast)
        pltpu.VMEM((block_q, 128), jnp.float32),  # running sum (lane-bcast)
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kb: (i, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kb: (i, j, 0)),
        scratch_shapes=scratch,
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            )
            if not interpret
            else None
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, t_pad, d_pad)[:, :, :t, :d]


# Measured crossover on v5e (2026-08, docs/bench_attention.jsonl,
# two-length-differencing timing — slope between an N- and 2N-iteration
# scan, cancelling the rig's variable relay RTT): XLA's fused attention
# wins the short-window tracking shapes (196 tokens at any stream count;
# multistream-64 = 3e7 logits: 0.48 ms vs flash 1.32 ms), flash wins every
# global-frame encode — 720p (1.6e8 logits): 0.78 vs 1.74 ms (2.2x);
# 1080p (8e8): 3.1 vs 334 ms (106x); 4K (1.3e10): 48 ms where XLA's
# materialized [B, H, T, T] cannot run at all (the streamed kernel's VMEM
# use is independent of T). Gate on the logits element count, the
# quantity that actually explodes, at 8e7 — the geometric midpoint of the
# measured [3e7, 1.6e8] bracket.
#
# The gate sees EXECUTED logits: callers under vmap (banked / multistream
# trackers — runtime/banked.py) pass their mapped bank/stream count as
# `batch_hint`, since tracing shapes don't show the mapped axis.
# Re-measure with tools/bench_attention.py.
FLASH_MIN_LOGITS_ELEMS = 8e7


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
