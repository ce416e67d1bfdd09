"""ViT weight init / save / load (SURVEY.md §5.4 checkpoint subsystem).

The reference describes inference only (README.md:42) and ships no weights
(SURVEY.md §0); weights here are random-init by default — random ViT
features are a serviceable appearance-similarity basis for template tracking
— or loaded from an .npz / orbax checkpoint (e.g. converted public ViT
weights) via `model.checkpoint` in config.yaml.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


from vitparticlefiltertracker_tpu.models.vit import VitSpec, init_vit_params


def ml_dtypes_name_to_dtype(name: str) -> np.dtype:
    import ml_dtypes

    return np.dtype(getattr(ml_dtypes, name))

# Param-layout version, stored in checkpoints. v2: fused wqkv columns are
# HEAD-MAJOR (h, 3, hd) — see models/vit.py:_block. v1 (q|k|v block-major)
# checkpoints would load without error but scramble attention, so loading
# an unversioned file warns loudly.
FORMAT_VERSION = 2


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_params(path: str, params, trunk_seed: int | None = None) -> None:
    """Save a param pytree. `.npz` for portability; orbax for dirs.

    Both formats carry the `__vpt_format__` layout-version marker (the orbax
    tree is wrapped as {"__vpt_format__", "params"}) so a pre-layout-change
    checkpoint can't silently scramble attention on load — round-1 ADVICE.

    trunk_seed: HEAD-ONLY save (residual-head training, models/vit.py:
    VitSpec.head_depth). The trunk is byte-frozen random init reproducible
    from `filter.seed`, so storing it wastes ~6-25x the file (ViT-L f32:
    1.2 GB trunk vs 50 MB head). Only the `head` subtree is written plus a
    `__vpt_trunk_seed__` marker; load_or_init regenerates the trunk with
    init_vit_params(key(trunk_seed ^ 0x5EED)) — the exact construction the
    trainer froze. The caller asserts the trunk really is that init (true
    by construction under training/train.py's head freeze).
    """
    if trunk_seed is not None:
        if not (isinstance(params, dict) and "head" in params):
            raise ValueError("trunk_seed save requires a 'head' subtree")
        params = {"head": params["head"]}
    if path.endswith(".npz"):
        flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
        if trunk_seed is not None:
            flat["__vpt_trunk_seed__"] = np.asarray(int(trunk_seed))
        # numpy's npz codec has no notion of ml_dtypes (bfloat16 round-trips
        # as raw void "|V2" and is unreadable by jnp.asarray). Store such
        # leaves as same-width uint views plus a dtype sidecar.
        dtypes = {}
        for k, v in flat.items():
            if v.dtype.kind == "V":
                dtypes[k] = str(v.dtype)
                flat[k] = v.view(f"u{v.dtype.itemsize}")
        flat["__vpt_format__"] = np.asarray(FORMAT_VERSION)
        flat["__vpt_dtypes__"] = np.frombuffer(
            json.dumps(dtypes).encode(), dtype=np.uint8
        )
        np.savez(path, **flat)
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    wrapped = {"__vpt_format__": np.asarray(FORMAT_VERSION), "params": params}
    if trunk_seed is not None:
        wrapped["__vpt_trunk_seed__"] = np.asarray(int(trunk_seed))
    ckptr.save(os.path.abspath(path), wrapped, force=True)
    ckptr.wait_until_finished()


def load_params(path: str):
    if path.endswith(".npz"):
        with np.load(path) as z:
            raw = {k: z[k] for k in z.files}
        dtypes = {}
        if "__vpt_dtypes__" in raw:
            dtypes = json.loads(raw.pop("__vpt_dtypes__").tobytes().decode())
        flat = {}
        for k, v in raw.items():
            if k in dtypes:
                v = v.view(ml_dtypes_name_to_dtype(dtypes[k]))
            elif v.dtype.kind == "V" and v.dtype.itemsize == 2:
                # Legacy file saved before the dtype sidecar: the only
                # 2-byte void leaves we ever wrote were bfloat16.
                v = v.view(ml_dtypes_name_to_dtype("bfloat16"))
            flat[k] = jnp.asarray(v)
        version = int(flat.pop("__vpt_format__", 0))
        trunk_seed = flat.pop("__vpt_trunk_seed__", None)
        if version not in (0, FORMAT_VERSION):
            raise ValueError(
                f"{path}: param format v{version}, this build expects "
                f"v{FORMAT_VERSION}"
            )
        if version == 0:
            import warnings

            warnings.warn(
                f"{path} has no format marker; if it was written before the "
                "head-major wqkv layout (format v2), attention weights will "
                "be scrambled — re-export with tools/import_vit.py",
                stacklevel=2,
            )
        tree = _unflatten(flat)
        if trunk_seed is not None:
            # HEAD-ONLY file (see save_params): the trunk is regenerated by
            # load_or_init from this seed; surface the marker in-tree.
            tree["__trunk_seed__"] = int(np.asarray(trunk_seed))
        return tree
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    if isinstance(tree, dict) and "__vpt_format__" in tree:
        version = int(np.asarray(tree["__vpt_format__"]))
        if version != FORMAT_VERSION:
            raise ValueError(
                f"{path}: param format v{version}, this build expects "
                f"v{FORMAT_VERSION}"
            )
        out = tree["params"]
        if "__vpt_trunk_seed__" in tree:
            out = dict(out, __trunk_seed__=int(np.asarray(tree["__vpt_trunk_seed__"])))
        return out
    import warnings

    warnings.warn(
        f"{path} is an unversioned orbax checkpoint; if it was written "
        "before the head-major wqkv layout (format v2), attention weights "
        "will be scrambled — re-export with tools/import_vit.py",
        stacklevel=2,
    )
    return tree


def load_or_init(checkpoint: str, spec: VitSpec, seed: int = 0):
    if checkpoint:
        prm = load_params(checkpoint)
        ts = prm.pop("__trunk_seed__", None) if isinstance(prm, dict) else None
        if ts is not None and spec.head_depth <= 0:
            # A HEAD-ONLY file exists solely to serve its trained head: the
            # forward pass only runs the head when spec.head_depth > 0
            # (models/vit.py), so loading one into a headless spec would
            # silently evaluate PURE RANDOM init while reporting the
            # checkpoint's name everywhere — exactly how two mislabeled
            # "trained" QUALITY rows got measured (round 5; the eval harness
            # passed the checkpoint but not model.head_depth). Refuse
            # loudly. (FULL checkpoints keep the documented trunk-only A/B
            # convenience — resolve_vit_params drops their head instead.)
            raise ValueError(
                f"{checkpoint} is a head-only checkpoint but "
                "model.head_depth is 0 — the trained head would be silently "
                "ignored and the model would be pure random init. Set "
                "model.head_depth to the depth the head was trained with "
                "(configs/train-head*.yaml: 2)."
            )
        if ts is not None:
            # HEAD-ONLY checkpoint (save_params trunk_seed): regenerate the
            # byte-frozen random trunk exactly as the trainer initialized it
            # (training/train.py init_fn == this construction) and attach
            # the stored head. init_vit_params with head_depth>0 keys the
            # head independently (fold_in 0x4EAD), so trunk leaves are
            # identical with or without a head in the spec.
            init = jax.jit(init_vit_params, static_argnames="spec")
            trunk = init(jax.random.key(int(ts) ^ 0x5EED), spec)
            prm = dict(trunk, head=prm["head"])
        return prm
    # (random init below is layout-free — iid entries)
    # One jitted executable for the whole init: on a remote-tunneled TPU,
    # eager init would dispatch ~150 individually-compiled ops; jitting
    # collapses it to a single compile and zero host<->device transfers.
    init = jax.jit(init_vit_params, static_argnames="spec")
    return init(jax.random.key(seed ^ 0x5EED), spec)


def cast_for_inference(params, spec: VitSpec):
    """Pre-cast the big matmul weights to the compute dtype ONCE.

    The forward pass casts every weight with `.astype(spec.dtype)` at use
    (models/vit.py) — correct for training (f32 masters), but at inference
    it re-converts the full parameter set from HBM EVERY step: ~1.8 GB of
    f32-read + bf16-write traffic per step for ViT-L, measured as ~20% of
    device step time ('convert' row, docs/PROFILE.md). Storing the block
    weights in the compute dtype makes those casts no-ops; values are
    bit-identical (astype(bf16) of the stored f32 is the same number).
    LN params stay f32 (used inside the f32-statistics layernorm) and
    patch_embed stays f32 (the tracker folds pixel normalization into it
    in f32 — runtime/tracker.py:_norm_folded_embed_weights)."""
    dt = spec.dtype
    if dt == jnp.float32:
        return params

    def cast(tree):
        return jax.tree.map(lambda x: x.astype(dt), tree)

    out = dict(params)
    out["blocks"] = {
        k: (dict(v) if isinstance(v, dict) else v)
        for k, v in params["blocks"].items()
    }
    out["blocks"]["attn"] = cast(params["blocks"]["attn"])
    out["blocks"]["mlp"] = cast(params["blocks"]["mlp"])
    if "head" in params:
        # Residual-head blocks (models/vit.py:VitSpec.head_depth): same
        # treatment as the trunk — matmul weights to compute dtype, LN f32.
        hb = {
            k: (dict(v) if isinstance(v, dict) else v)
            for k, v in params["head"]["blocks"].items()
        }
        hb["attn"] = cast(params["head"]["blocks"]["attn"])
        hb["mlp"] = cast(params["head"]["blocks"]["mlp"])
        out["head"] = dict(params["head"], blocks=hb)
    for k in ("cls_token", "pos_embed"):
        if k in out and out[k] is not None:
            out[k] = out[k].astype(dt)
    return out


def resolve_vit_params(cfg, vit_params=None):
    """Shared weight resolution for Tracker/MultiTracker/MultiStreamTracker:
    honor an explicit pytree, else load cfg.model.checkpoint or random-init,
    with the crop-mode image-size override applied to the spec; block
    weights pre-cast to the compute dtype (see cast_for_inference)."""
    spec = VitSpec.from_config(cfg.model)
    if cfg.tracker.mode == "crop":
        spec = spec._replace(image_size=cfg.tracker.crop_size)
    if vit_params is None:
        vit_params = load_or_init(cfg.model.checkpoint, spec, cfg.filter.seed)
    if spec.head_depth > 0 and "head" not in vit_params:
        raise ValueError(
            f"model.head_depth={spec.head_depth} but the weights have no "
            "'head' subtree — train one with configs/train-head.yaml or set "
            "model.head_depth: 0"
        )
    if spec.head_depth > 0 and "head" in vit_params:
        have = int(jax.tree.leaves(vit_params["head"]["blocks"])[0].shape[0])
        if have != spec.head_depth:
            raise ValueError(
                f"model.head_depth={spec.head_depth} but the checkpoint's "
                f"head has {have} blocks"
            )
    if spec.head_depth == 0 and isinstance(vit_params, dict) and "head" in vit_params:
        # A head checkpoint can serve a headless config (e.g. quick A/B of
        # trunk-only tracking): drop the head instead of wasting compute on
        # features the blend would ignore.
        vit_params = {k: v for k, v in vit_params.items() if k != "head"}
    return cast_for_inference(vit_params, spec)
