#!/usr/bin/env python
"""Convert Hugging Face ViT weights to this framework's param pytree.

SURVEY.md §5.4: ViT weights are "random-init or converted public ViT
weights". This converter maps a `transformers.ViTModel` (the standard
`google/vit-base-patch16-224`-family architecture) onto models/vit.py's
layout:

  * patch conv [D, C, p, p]      -> patchify matmul kernel [(py, px, c), D]
  * separate q/k/v Linears       -> fused wqkv [D, 3D], columns head-major
                                    (h, 3, hd) to match models/vit.py
  * per-layer dicts              -> depth-stacked pytree for the lax.scan
  * cls token + pos embeddings   -> carried through unchanged

Numerical parity with the torch forward is tested in
tests/test_import_vit.py using a small RANDOM-init HF config (no network),
so the mapping is verified end-to-end offline; the same code converts real
pretrained checkpoints wherever they are available.

Usage:
  python tools/import_vit.py <hf-model-name-or-path> out.npz
  # then: config model.checkpoint: out.npz, model.variant matching the arch
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vitparticlefiltertracker_tpu.models.vit import VitSpec  # noqa: E402


def spec_from_hf_config(cfg) -> VitSpec:
    """VitSpec matching a transformers.ViTConfig."""
    return VitSpec(
        depth=cfg.num_hidden_layers,
        dim=cfg.hidden_size,
        heads=cfg.num_attention_heads,
        mlp_dim=cfg.intermediate_size,
        patch_size=cfg.patch_size,
        image_size=cfg.image_size,
        use_cls_token=True,
        use_pos_embed=True,
        pooling="cls",
        ln_eps=cfg.layer_norm_eps,
    )


def convert_hf_vit(model) -> tuple[dict, VitSpec]:
    """transformers.ViTModel -> (params pytree, VitSpec). Torch CPU only."""
    import jax.numpy as jnp

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = model.config
    spec = spec_from_hf_config(cfg)
    d = spec.dim

    def t(name):  # torch Linear stores [out, in]; we use [in, out]
        return jnp.asarray(sd[name].T)

    conv = sd["embeddings.patch_embeddings.projection.weight"]  # [D, C, p, p]
    kernel = jnp.asarray(np.transpose(conv, (2, 3, 1, 0)).reshape(-1, d))
    params: dict = {
        "patch_embed": {
            "kernel": kernel,
            "bias": jnp.asarray(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": jnp.asarray(sd["embeddings.cls_token"]).reshape(d),
        "pos_embed": jnp.asarray(sd["embeddings.position_embeddings"]).reshape(
            -1, d
        ),
        "ln_final": {
            "scale": jnp.asarray(sd["layernorm.weight"]),
            "bias": jnp.asarray(sd["layernorm.bias"]),
        },
    }

    blocks = []
    for i in range(spec.depth):
        pre = f"encoder.layer.{i}."
        att = pre + "attention.attention."
        wq, wk, wv = (t(att + f"{n}.weight") for n in ("query", "key", "value"))
        bq, bk, bv = (
            jnp.asarray(sd[att + f"{n}.bias"]) for n in ("query", "key", "value")
        )
        h = spec.heads
        hd = d // h
        # Head-major fused layout (h, 3, hd) — see models/vit.py:_block.
        wqkv = jnp.stack(
            [w.reshape(d, h, hd) for w in (wq, wk, wv)], axis=2
        ).reshape(d, 3 * d)
        bqkv = jnp.stack(
            [bvec.reshape(h, hd) for bvec in (bq, bk, bv)], axis=1
        ).reshape(3 * d)
        blocks.append(
            {
                "ln1": {
                    "scale": jnp.asarray(sd[pre + "layernorm_before.weight"]),
                    "bias": jnp.asarray(sd[pre + "layernorm_before.bias"]),
                },
                "attn": {
                    "wqkv": wqkv,
                    "bqkv": bqkv,
                    "wo": t(pre + "attention.output.dense.weight"),
                    "bo": jnp.asarray(sd[pre + "attention.output.dense.bias"]),
                },
                "ln2": {
                    "scale": jnp.asarray(sd[pre + "layernorm_after.weight"]),
                    "bias": jnp.asarray(sd[pre + "layernorm_after.bias"]),
                },
                "mlp": {
                    "w1": t(pre + "intermediate.dense.weight"),
                    "b1": jnp.asarray(sd[pre + "intermediate.dense.bias"]),
                    "w2": t(pre + "output.dense.weight"),
                    "b2": jnp.asarray(sd[pre + "output.dense.bias"]),
                },
            }
        )
    import jax

    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params, spec


def main() -> int:
    from transformers import ViTModel

    from vitparticlefiltertracker_tpu.models.params import save_params

    name, out = sys.argv[1], sys.argv[2]
    model = ViTModel.from_pretrained(name)
    params, spec = convert_hf_vit(model)
    save_params(out, params)
    print(
        f"converted {name} -> {out}\n"
        f"spec: depth={spec.depth} dim={spec.dim} heads={spec.heads} "
        f"mlp={spec.mlp_dim} patch={spec.patch_size} img={spec.image_size} "
        f"ln_eps={spec.ln_eps}\n"
        "config: set model.checkpoint to this file, model.variant to the "
        "matching preset (or 'custom' with the dims above), "
        f"model.ln_eps: {spec.ln_eps}, and model.drop_cls_token: false."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
