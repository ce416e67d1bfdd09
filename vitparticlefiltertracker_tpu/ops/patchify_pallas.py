"""Pallas TPU kernel: fused gather+patchify over a VMEM-resident window.

Component B6's kernel form (SURVEY.md §2.2; BASELINE.json:5 "fused
gather+patchify kernel so all N particle hypotheses share one ViT forward").
The composite XLA lowering lives in ops/patchify.py; this kernel is the
TPU-native fusion of the same math:

    for each particle box (center, size) in window coords:
        crop  = Wy(box) @ window @ Wx(box)^T        # separable bilinear, MXU
        toks  = patchify(crop)                      # [g*g, p*p*C] repack
        out   = toks @ K + b                        # patch embed, MXU

all inside ONE kernel invocation — the sampled pixels live only in VMEM,
never round-tripping to HBM between sampling and the embed GEMM. The
bilinear weights Wy/Wx are *built in-kernel* from each box's 4 scalars
(hat-function of an iota grid), so per-particle HBM traffic is 16 bytes in,
g*g*D values out.

Layout choices (see /opt/skills/guides/pallas_guide.md):
  * The window is passed channel-major-in-lanes as [Swin, C*Swin]
    (window_col[r, c*Swin + w] = window[r, w, c]) so both sampling
    contractions are plain 2D MXU matmuls; the column mixer Wx3 is the
    block-diagonal kron(I_C, Wx^T) built from iotas on the VPU.
  * One grid program handles `block_n` particles (fori_loop), accumulating
    their token features in a VMEM scratch, then runs ONE [block_n*g*g, p*p*C]
    x [p*p*C, D] embed matmul — big enough to feed the MXU properly.

Sampling from a fixed-size resampled search window (rather than the raw
frame) is what bounds the kernel's input to VMEM scale at any frame
resolution — 4K frames and 224px windows cost the same here. The two-stage
(window-resample -> crop-resample) semantics are shared with the XLA
reference path `window_gather_patchify_xla`, which the kernel is unit-tested
against (tests/test_patchify_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only lowers on TPU; import is safe everywhere.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _hat(sample: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear hat weights max(0, 1 - |sample - grid|), elementwise."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(sample - grid))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_patchify_kernel(
    boxes_ref,  # SMEM [block_n, 4] f32: (cx, cy, w, h) in window px
    win_ref,  # VMEM [Swin, C*Swin] f32 channel-major columns
    kern_ref,  # VMEM [p*C*p, D] embed weight, rows ordered (py, c, px)
    bias_ref,  # VMEM [1, D]
    out_ref,  # VMEM [block_n * g*g, D]
    tok_ref,  # VMEM scratch [block_n * g*g, p*C*p] f32, cols (py, c, px)
    *,
    swin: int,
    crop: int,
    patch: int,
    channels: int,
    block_n: int,
):
    g = crop // patch
    g2 = g * g
    c = channels
    p = patch
    cp = c * p  # one (c, px) feature stripe
    cp_pad = _round_up(cp, 128)  # lane-aligned stripe (Mosaic stores must
    # land on 128-lane boundaries; the pad columns carry zero weights and
    # match zero rows in the permuted embed matrix)

    # Static iota grids shared by every particle in the block.
    row_k = jax.lax.broadcasted_iota(jnp.int32, (crop, swin), 0).astype(jnp.float32)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (crop, swin), 1).astype(jnp.float32)
    # Column mixer index grids: rows (c_in, w) in [C*Swin); cols laid out
    # (gx, pad(c, px)) in [g*cp_pad) — gx-major so each token's stripe is one
    # contiguous, lane-aligned slice.
    r3 = jax.lax.broadcasted_iota(jnp.int32, (c * swin, g * cp_pad), 0)
    c3 = jax.lax.broadcasted_iota(jnp.int32, (c * swin, g * cp_pad), 1)
    chan_row = r3 // swin
    w3 = (r3 % swin).astype(jnp.float32)
    gx3 = c3 // cp_pad
    rpad = c3 % cp_pad
    valid_col = rpad < cp
    chan_col = jnp.minimum(rpad, cp - 1) // p
    px3 = rpad % p
    j3 = (gx3 * p + px3).astype(jnp.float32)  # crop-column index of each col

    # Python-unrolled particle loop: every store below then has a fully
    # static destination (Mosaic rejects single-row vector stores at traced
    # sublane offsets). block_n is small, so the unroll is cheap.
    for ib in range(block_n):
        cx = boxes_ref[ib, 0]
        cy = boxes_ref[ib, 1]
        bw = boxes_ref[ib, 2]
        bh = boxes_ref[ib, 3]

        # Sample coords (pixel-centered, clamp-to-edge — matches
        # ops/patchify.py crop_sample_coords + ops/image.py hat_weights).
        yk = jnp.clip(cy + bh * ((row_k + 0.5) / crop - 0.5), 0.0, swin - 1.0)
        wy = _hat(yk, col_r)  # [crop, Swin]
        t1 = jax.lax.dot_general(
            wy, win_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [crop, C*Swin]

        xj = jnp.clip(cx + bw * ((j3 + 0.5) / crop - 0.5), 0.0, swin - 1.0)
        wx3 = jnp.where(
            valid_col & (chan_row == chan_col), _hat(xj, w3), 0.0
        )  # [C*Swin, g*cp_pad]
        crop2 = jax.lax.dot_general(
            t1, wx3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [crop, g*cp_pad]; crop2[gy*p+py, (gx, pad(c, px))]

        # Patchify repack WITHOUT vector reshapes (Mosaic rejects high-rank
        # reshapes): each (gy, gx, py) combination is one contiguous,
        # lane-aligned [1, cp_pad] stripe of crop2, stored at static column
        # offset py*cp_pad of its token's row. g*g*p small stores per
        # particle; the embed weight rows are permuted/zero-padded to the
        # matching (py, pad(c, px)) order on the host side.
        for gy in range(g):
            for gx in range(g):
                row = ib * g2 + gy * g + gx  # fully static
                for py in range(p):
                    tok_ref[row : row + 1, py * cp_pad : (py + 1) * cp_pad] = crop2[
                        gy * p + py : gy * p + py + 1,
                        gx * cp_pad : (gx + 1) * cp_pad,
                    ]

    # One embed GEMM for the whole particle block.
    out_ref[:] = (
        jax.lax.dot_general(
            tok_ref[:].astype(kern_ref.dtype), kern_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0, :].astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("crop_size", "patch_size", "block_n", "interpret"),
)
def gather_patchify_window_pallas(
    window: jax.Array,  # [Swin, Swin, C] normalized float window
    centers: jax.Array,  # [N, 2] (x, y) in window px
    sizes: jax.Array,  # [N, 2] (w, h) in window px
    crop_size: int,
    patch_size: int,
    kernel: jax.Array,  # [p*p*C, D] patch-embed weight
    bias: jax.Array,  # [D]
    *,
    block_n: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused crop-sample + patchify + embed -> [N, g*g, D] tokens."""
    swin, swin2, c = window.shape
    assert swin == swin2, "window must be square"
    n = centers.shape[0]
    p = patch_size
    g = crop_size // p
    g2 = g * g
    d = kernel.shape[1]

    n_pad = ((n + block_n - 1) // block_n) * block_n
    boxes = jnp.concatenate([centers, sizes], axis=-1).astype(jnp.float32)
    boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))

    # Channel-major columns: win_col[r, c*Swin + w] = window[r, w, c].
    win_col = jnp.transpose(window.astype(jnp.float32), (0, 2, 1)).reshape(
        swin, c * swin
    )

    # The kernel emits token features in (py, pad(c, px)) order — contiguous
    # lane-aligned stripes of its column-mixed sample matrix. Permute the
    # embed weight's rows from the canonical (py, px, c) to match and insert
    # zero rows for the lane padding — host-side, once.
    cp = c * p
    cp_pad = _round_up(cp, 128)
    kperm = kernel.reshape(p, p, c, d).transpose(0, 2, 1, 3).reshape(p, cp, d)
    kern = jnp.pad(kperm, ((0, 0), (0, cp_pad - cp), (0, 0))).reshape(
        p * cp_pad, d
    )
    grid = (n_pad // block_n,)
    kernel_fn = functools.partial(
        _window_patchify_kernel,
        swin=swin,
        crop=crop_size,
        patch=p,
        channels=c,
        block_n=block_n,
    )
    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((n_pad * g2, d), kern.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 4), lambda i: (i, 0), memory_space=smem),
            pl.BlockSpec((swin, c * swin), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec(kern.shape, lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((block_n * g2, d), lambda i: (i, 0), memory_space=vmem),
        scratch_shapes=[
            (pltpu.VMEM if pltpu is not None else pl.ANY)(
                (block_n * g2, p * cp_pad), jnp.float32
            )
        ],
        interpret=interpret,
    )(boxes, win_col, kern, bias.reshape(1, d).astype(kern.dtype))
    return out.reshape(n_pad, g2, d)[:n]


def window_gather_patchify_xla(
    window: jax.Array,  # [Swin, Swin, C]
    centers: jax.Array,
    sizes: jax.Array,
    crop_size: int,
    patch_size: int,
    kernel: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """XLA reference for the kernel's exact two-stage semantics.

    Same math, lowered by XLA: gather-based bilinear crops from the window
    (clamp-to-edge) followed by the patchify reshape and one embed matmul.
    The Pallas kernel must match this to f32 tolerance.
    """
    from vitparticlefiltertracker_tpu.models.vit import patchify
    from vitparticlefiltertracker_tpu.ops.patchify import extract_crops

    crops = extract_crops(window.astype(jnp.float32), centers, sizes, crop_size)
    toks = patchify(crops, patch_size)  # [N, g*g, p*p*C], canonical layout
    return toks.astype(kernel.dtype) @ kernel + bias.astype(kernel.dtype)
