"""Checkpoint/resume (SURVEY.md §5.4): ViT weights and TrackerState.

The RNG is counter-based (key + frame_idx), so resuming a checkpointed
stream must reproduce the uninterrupted trajectory bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.models.params import load_or_init, load_params, save_params
from vitparticlefiltertracker_tpu.models.vit import VitSpec, vit_embed
from vitparticlefiltertracker_tpu.runtime.tracker import (
    Tracker,
    load_tracker_state,
    save_tracker_state,
)


def tiny_cfg():
    return Config.from_dict(
        {
            "model": {"variant": "vit-t16", "image_size": 64, "dtype": "float32",
                      "use_flash_attention": False},
            "filter": {"num_particles": 128},
            "tracker": {"mode": "dense"},
        }
    )


def test_params_npz_roundtrip(tmp_path):
    spec = VitSpec(depth=2, dim=64, heads=2, mlp_dim=128, image_size=32,
                   dtype=jnp.float32, use_flash_attention=False)
    params = load_or_init("", spec, seed=3)
    path = str(tmp_path / "vit.npz")
    save_params(path, params)
    loaded = load_params(path)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(vit_embed(params, x, spec)), np.asarray(vit_embed(loaded, x, spec))
    )


def test_params_npz_roundtrip_bfloat16(tmp_path):
    """npz round-trip of bf16 params. numpy's npz codec knows nothing of
    ml_dtypes (bf16 came back as void "|V2" and was unloadable — found when
    the first trained checkpoint hit eval); leaves are stored as uint views
    with a dtype sidecar, and sidecar-less legacy files recover via the
    V2→bfloat16 view in load_params."""
    spec = VitSpec(depth=2, dim=64, heads=2, mlp_dim=128, image_size=32,
                   dtype=jnp.bfloat16, use_flash_attention=False)
    params = load_or_init("", spec, seed=7)
    path = str(tmp_path / "vit_bf16.npz")
    save_params(path, params)
    loaded = load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_params_orbax_roundtrip_carries_format_version(tmp_path):
    """Orbax directory checkpoints carry the layout-version marker too
    (round-1 ADVICE: only .npz was guarded)."""
    ocp = __import__("pytest").importorskip("orbax.checkpoint")
    del ocp
    spec = VitSpec(depth=1, dim=32, heads=2, mlp_dim=64, image_size=32,
                   dtype=jnp.float32, use_flash_attention=False)
    params = load_or_init("", spec, seed=5)
    path = str(tmp_path / "ckpt_dir")
    save_params(path, params)
    loaded = load_params(path)
    np.testing.assert_array_equal(
        np.asarray(params["patch_embed"]["kernel"]),
        np.asarray(loaded["patch_embed"]["kernel"]),
    )


def test_tracker_checkpoint_used_via_config(tmp_path):
    """model.checkpoint in config.yaml loads the saved weights (B1/§5.4)."""
    cfg = tiny_cfg()
    spec = VitSpec.from_config(cfg.model)
    params = load_or_init("", spec, seed=9)
    path = str(tmp_path / "w.npz")
    save_params(path, params)
    cfg.model.checkpoint = path
    tr = Tracker(cfg)  # must load from the checkpoint without error
    np.testing.assert_array_equal(
        np.asarray(tr.vit_params["patch_embed"]["kernel"]),
        np.asarray(params["patch_embed"]["kernel"]),
    )


def test_state_resume_bitwise_identical(tmp_path):
    cfg = tiny_cfg()
    src = open_source("synthetic:moving-square", num_frames=12, frame_size=(128, 128))
    frames = list(src)

    # Uninterrupted run.
    tr_a = Tracker(cfg)
    tr_a.init(frames[0], src.init_bbox)
    recs_a = [tr_a.step(f) for f in frames[1:]]

    # Run 5 frames, checkpoint, resume in a FRESH tracker, run the rest.
    tr_b = Tracker(cfg)
    tr_b.init(frames[0], src.init_bbox)
    for f in frames[1:6]:
        tr_b.step(f)
    ckpt = str(tmp_path / "state.npz")
    tr_b.save(ckpt)

    tr_c = Tracker(cfg)
    tr_c.resume(ckpt)
    recs_c = [tr_c.step(f) for f in frames[6:]]

    for ra, rc in zip(recs_a[5:], recs_c):
        np.testing.assert_array_equal(ra["position"], rc["position"])
        assert ra["resampled"] == rc["resampled"]
        np.testing.assert_array_equal(ra["ess"], rc["ess"])


def test_state_checkpoint_is_name_keyed(tmp_path):
    """v1 format: entries are field-named, not positional (VERDICT weak #4)."""
    cfg = tiny_cfg()
    src = open_source("synthetic:moving-square", num_frames=2, frame_size=(128, 128))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    path = str(tmp_path / "s.npz")
    tr.save(path)
    with np.load(path) as z:
        keys = set(z.files)
    assert {"pf/particles", "pf/log_weights", "template", "anchor", "key",
            "__vpt_state_format__"} <= keys


def test_state_legacy_positional_checkpoint_loads(tmp_path):
    """Round-1 positional leaf_<i> files (with and without the anchor leaf)
    must still resume correctly."""
    cfg = tiny_cfg()
    src = open_source("synthetic:moving-square", num_frames=2, frame_size=(128, 128))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    state = tr.state._replace(key=jax.random.key_data(tr.state.key))
    # Round-1 states had no lost_count leaf (the last field): 11 leaves.
    leaves = jax.tree_util.tree_leaves(state)[:11]

    full = str(tmp_path / "legacy_full.npz")
    np.savez(full, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    loaded = load_tracker_state(full)
    np.testing.assert_array_equal(
        np.asarray(loaded.pf.particles), np.asarray(tr.state.pf.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.template), np.asarray(tr.state.template)
    )

    # Pre-anchor layout (anchor leaf missing, index 3): anchor := template.
    pre = str(tmp_path / "legacy_preanchor.npz")
    no_anchor = leaves[:3] + leaves[4:]
    np.savez(pre, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(no_anchor)})
    loaded = load_tracker_state(pre)
    np.testing.assert_array_equal(
        np.asarray(loaded.anchor), np.asarray(tr.state.template)
    )


def test_state_named_checkpoint_missing_anchor_defaults(tmp_path):
    """A v1 file written before the anchor field existed loads with
    anchor := template instead of mis-assigning leaves."""
    cfg = tiny_cfg()
    src = open_source("synthetic:moving-square", num_frames=2, frame_size=(128, 128))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    path = str(tmp_path / "s.npz")
    tr.save(path)
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    del flat["anchor"]
    stripped = str(tmp_path / "stripped.npz")
    np.savez(stripped, **flat)
    loaded = load_tracker_state(stripped)
    np.testing.assert_array_equal(
        np.asarray(loaded.anchor), np.asarray(loaded.template)
    )


def test_state_roundtrip_preserves_pytree(tmp_path):
    cfg = tiny_cfg()
    src = open_source("synthetic:moving-square", num_frames=3, frame_size=(128, 128))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    tr.step(frames[1])
    path = str(tmp_path / "s.npz")
    save_tracker_state(path, tr.state)
    loaded = load_tracker_state(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state._replace(key=jax.random.key_data(tr.state.key))),
        jax.tree_util.tree_leaves(loaded._replace(key=jax.random.key_data(loaded.key))),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_head_checkpoint_into_headless_spec_refuses(tmp_path):
    """A trained-head file loaded into a spec with head_depth=0 must raise:
    the forward pass would silently ignore the head and evaluate pure random
    init under the checkpoint's name (the round-5 mislabeled-QUALITY-rows
    bug — models/params.py:load_or_init guard)."""
    import pytest

    spec_h = VitSpec(depth=2, dim=64, heads=2, mlp_dim=128, image_size=32,
                     dtype=jnp.float32, use_flash_attention=False,
                     head_depth=1)
    params = load_or_init("", spec_h, seed=3)
    path = str(tmp_path / "head.npz")
    save_params(path, {"head": params["head"]}, trunk_seed=3)
    spec_0 = VitSpec(depth=2, dim=64, heads=2, mlp_dim=128, image_size=32,
                     dtype=jnp.float32, use_flash_attention=False)
    with pytest.raises(ValueError, match="head_depth"):
        load_or_init(path, spec_0, seed=3)
    # The same file into the matching spec loads fine (and the trunk is the
    # byte-frozen regeneration).
    loaded = load_or_init(path, spec_h, seed=3)
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"]["attn"]["wqkv"]),
        np.asarray(params["blocks"]["attn"]["wqkv"]),
    )
