"""From-scratch Vision Transformer appearance model (component B4).

The reference names "Vision Transformer (ViT): state-of-the-art deep
learning techniques for superior feature extraction and object recognition"
(/root/reference/README.md:7) with no implementation (SURVEY.md §0). This is
a pure-JAX (framework-free) pre-LN ViT encoder designed around the TPU's
compilation model:

* patchify is a reshape/transpose + ONE [B*T, p²C] x [p²C, D] matmul — a
  single large MXU op instead of a convolution;
* attention dispatches to the Pallas flash kernel (ops/attention.py) on TPU;
* compute dtype is bfloat16 by default with f32 layernorm statistics and a
  f32 residual stream option folded into LN — weights live in f32 and are
  cast at the call boundary, so one param pytree serves both precisions;
* everything is shape-static: one compile per (batch, image_size) config.

Params are a plain nested dict pytree (init_vit_params) — trivially
checkpointable with orbax/npz and shardable with jax.sharding.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.ops.attention import multi_head_attention


class VitSpec(NamedTuple):
    depth: int = 12
    dim: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    pooling: str = "mean"  # "mean" | "cls"
    dtype: Any = jnp.bfloat16  # compute dtype
    use_flash_attention: bool = True
    use_cls_token: bool = False  # dense tracking pools patch tokens
    ln_eps: float = 1e-6  # HF ViT checkpoints use 1e-12 (tools/import_vit.py)
    # Dense tracking needs translation-EQUIVARIANT token features: with
    # positional embeddings, an ROI embedding encodes where the box sits in
    # the search window (which is centered on the previous estimate), so the
    # tracker self-confirms and drifts. Crop mode keeps them (every crop has
    # its own coordinate frame).
    use_pos_embed: bool = True
    # Static multiplier for batch axes INVISIBLE at trace time (an outer
    # vmap over banks/streams): the flash-attention dispatch gate must see
    # the EXECUTED logits size, not the per-example traced shape
    # (ops/attention.py:multi_head_attention). runtime/banked.py sets this
    # to its bank/stream count.
    attn_batch_hint: int = 1
    # Layer-loop lowering: 0 = FULL unroll (fastest on-chip: XLA schedules
    # all layers globally — measured 0.32 vs 0.45 ms for a batch-1 ViT-B
    # window encode; partial unrolls 2-6 are SLOWER than scan, the scan's
    # per-layer weight-DMA pipeline beats half-measures), 1 = lax.scan
    # (cheapest compile: traces one block), k>1 = scan with unroll=k.
    scan_unroll: int = 0
    # RESIDUAL DISCRIMINATIVE HEAD (round 3, docs/QUALITY.md): k extra
    # transformer blocks appended AFTER the frozen trunk, producing a second
    # feature half — encode_tokens returns [B, T, 2*dim] =
    # concat(LN_final(trunk), LN_head(head(trunk_stream))). The appearance
    # score becomes a blend (1-b)*cos_trunk + b*cos_head (ops/likelihood.py
    # split plumbing), so the trunk's matched-filter landscape — which the
    # z-normed likelihood provably needs and which seeded RANDOM init
    # already provides near-optimally on rigid targets — is preserved
    # bit-exactly while training adds ONLY pattern-level discrimination
    # (the lookalike / object-recognition capability, reference
    # README.md:7). 0 = no head (plain [B, T, dim] output).
    head_depth: int = 0

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)

    @classmethod
    def from_config(cls, m) -> "VitSpec":
        """Build from config.ModelConfig (config.py)."""
        return cls(
            depth=m.depth,
            dim=m.dim,
            heads=m.heads,
            mlp_dim=m.mlp_dim,
            patch_size=m.patch_size,
            image_size=m.image_size,
            pooling=m.pooling,
            dtype=jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32,
            use_flash_attention=m.use_flash_attention,
            use_cls_token=(m.pooling == "cls") or not m.drop_cls_token,
            ln_eps=m.ln_eps,
            scan_unroll=m.scan_unroll,
            head_depth=m.head_depth,
        )

    @property
    def out_dim(self) -> int:
        """Token feature width encode_tokens emits (2*dim with a head)."""
        return self.dim * (2 if self.head_depth > 0 else 1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_vit_params(key: jax.Array, spec: VitSpec) -> dict:
    """Truncated-normal / zeros init, f32 master weights."""
    d, h, mlp = spec.dim, spec.heads, spec.mlp_dim
    patch_in = spec.patch_size * spec.patch_size * 3

    def tn(k, shape, std):
        return (std * jax.random.truncated_normal(k, -2.0, 2.0, shape)).astype(jnp.float32)

    keys = jax.random.split(key, 4 + spec.depth)
    params: dict = {
        "patch_embed": {
            "kernel": tn(keys[0], (patch_in, d), patch_in**-0.5),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "pos_embed": tn(keys[1], (spec.seq_len, d), 0.02),
        "ln_final": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
    }
    if spec.use_cls_token:
        params["cls_token"] = tn(keys[2], (d,), 0.02)

    # Blocks are STACKED along a leading depth axis and executed with
    # lax.scan — the trace/compile cost is one block, not `depth` blocks
    # (a 12-24x jaxpr reduction; compiles through a slow TPU tunnel would
    # otherwise dominate startup).
    def make_block(bkey):
        bk = jax.random.split(bkey, 4)
        return {
            "ln1": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
            "attn": {
                # Fused qkv, columns head-major (h, 3, hd) — see _block.
                "wqkv": tn(bk[0], (d, 3 * d), d**-0.5),
                "bqkv": jnp.zeros((3 * d,), jnp.float32),
                "wo": tn(bk[1], (d, d), d**-0.5),
                "bo": jnp.zeros((d,), jnp.float32),
            },
            "ln2": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
            "mlp": {
                "w1": tn(bk[2], (d, mlp), d**-0.5),
                "b1": jnp.zeros((mlp,), jnp.float32),
                "w2": tn(bk[3], (mlp, d), mlp**-0.5),
                "b2": jnp.zeros((d,), jnp.float32),
            },
        }

    blocks = [make_block(keys[4 + i]) for i in range(spec.depth)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    if spec.head_depth > 0:
        # Residual head blocks (see VitSpec.head_depth). Keyed independently
        # of the trunk so adding a head never perturbs the trunk's seeded
        # random weights — the b=0 trunk-only score must stay bit-identical
        # to the headless model.
        hkeys = jax.random.split(
            jax.random.fold_in(key, 0x4EAD), spec.head_depth
        )
        hblocks = [make_block(hk) for hk in hkeys]
        params["head"] = {
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *hblocks),
            "ln": {
                "scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32),
            },
        }
    return params


def param_count(params: dict) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x: jax.Array, p: dict, dtype, eps: float = 1e-6) -> jax.Array:
    """LN with f32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, C] -> [B, T, p*p*C] token pixels via reshape/transpose.

    Replaces the usual conv patch-embed front half; the matmul half happens
    in vit_forward_tokens as one MXU-sized GEMM.
    """
    b, hh, ww, c = images.shape
    p = patch_size
    gh, gw = hh // p, ww // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
    return x.reshape(b, gh * gw, p * p * c)


def _block(x: jax.Array, p: dict, spec: VitSpec) -> jax.Array:
    b, t, d = x.shape
    h = spec.heads
    hd = d // h
    dtype = spec.dtype

    y = _layer_norm(x, p["ln1"], dtype, spec.ln_eps)
    qkv = y @ p["attn"]["wqkv"].astype(dtype) + p["attn"]["bqkv"].astype(dtype)
    # Fused qkv columns are laid out HEAD-MAJOR (h, 3, hd) — see
    # init_vit_params — so a tensor-parallel sharding of the fused axis
    # (parallel/mesh.py:vit_param_sharding) propagates through this reshape
    # as whole heads per shard instead of splitting the q|k|v blocks.
    qkv = qkv.reshape(b, t, h, 3, hd).transpose(3, 0, 2, 1, 4)  # [3, B, H, T, hd]
    o = multi_head_attention(
        qkv[0],
        qkv[1],
        qkv[2],
        use_flash=spec.use_flash_attention,
        batch_hint=spec.attn_batch_hint,
    )  # [B, H, T, hd]
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + (o @ p["attn"]["wo"].astype(dtype) + p["attn"]["bo"].astype(dtype))

    y = _layer_norm(x, p["ln2"], dtype, spec.ln_eps)
    y = y @ p["mlp"]["w1"].astype(dtype) + p["mlp"]["b1"].astype(dtype)
    # Exact (erf) GELU — matches torch/HF ViT checkpoints; the tanh
    # approximation drifts ~1e-3 per block, which compounds over depth.
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["mlp"]["w2"].astype(dtype) + p["mlp"]["b2"].astype(dtype)
    return x + y


def vit_forward_tokens(params: dict, images: jax.Array, spec: VitSpec) -> jax.Array:
    """Full encoder -> token features [B, T, D] (post final-LN).

    images: [B, H, W, 3], already normalized float (any float dtype).
    The dense tracker consumes this as a feature map (SURVEY.md §1.2); crop
    mode pools it per-crop via vit_embed.
    """
    dtype = spec.dtype
    tokens = patchify(images.astype(dtype), spec.patch_size)
    x = tokens @ params["patch_embed"]["kernel"].astype(dtype) + params["patch_embed"][
        "bias"
    ].astype(dtype)
    return encode_tokens(params, x, spec)


def encode_tokens(params: dict, x: jax.Array, spec: VitSpec) -> jax.Array:
    """Encoder over already-patch-embedded tokens [B, T_patches, D].

    Split out so the fused gather+patchify kernel (ops/patchify.py) can feed
    patch embeddings straight into the transformer.
    """
    dtype = spec.dtype
    b = x.shape[0]
    if spec.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, spec.dim))
        x = jnp.concatenate([cls, x], axis=1)
    if spec.use_pos_embed:
        x = x + params["pos_embed"].astype(dtype)[None, : x.shape[1]]

    def body(carry, bp):
        return _block(carry, bp, spec), None

    unroll = spec.depth if spec.scan_unroll == 0 else spec.scan_unroll
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=unroll)
    trunk = _layer_norm(x, params["ln_final"], dtype, spec.ln_eps)
    if spec.head_depth <= 0:
        return trunk
    # Residual head (VitSpec.head_depth): continue the PRE-final-LN stream
    # through the head blocks (pre-LN architecture — ln_final is a readout,
    # not part of the stream), own readout LN, concat as a second feature
    # half. The trunk half is byte-identical to the headless forward.
    h_unroll = spec.head_depth if spec.scan_unroll == 0 else spec.scan_unroll
    h, _ = jax.lax.scan(body, x, params["head"]["blocks"], unroll=h_unroll)
    head = _layer_norm(h, params["head"]["ln"], dtype, spec.ln_eps)
    return jnp.concatenate([trunk, head], axis=-1)


def pool_tokens(tokens: jax.Array, spec: VitSpec) -> jax.Array:
    """[B, T, D] -> [B, D] appearance embedding."""
    if spec.pooling == "cls":
        return tokens[:, 0]
    start = 1 if spec.use_cls_token else 0
    return jnp.mean(tokens[:, start:], axis=1)


def vit_embed(params: dict, images: jax.Array, spec: VitSpec) -> jax.Array:
    """[B, H, W, 3] -> [B, D] pooled appearance embedding."""
    return pool_tokens(vit_forward_tokens(params, images, spec), spec)
