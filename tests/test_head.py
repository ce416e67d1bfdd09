"""Residual discriminative head (models/vit.py:VitSpec.head_depth).

The design guarantee under test: the trunk half of a head model is
bit-identical to the headless model, so at `model.head_blend: 0` the whole
tracker reproduces the random-init trajectory EXACTLY — a trained head can
only add discrimination, never erode the trunk's matched-filter landscape
(docs/QUALITY.md; reference README.md:7 "object recognition").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.models.vit import (
    VitSpec,
    init_vit_params,
    vit_forward_tokens,
)
from vitparticlefiltertracker_tpu.runtime.tracker import Tracker


def _cfg(head_depth: int, blend: float) -> Config:
    return Config.from_dict({
        "model": {
            "variant": "vit-t16",
            "image_size": 64,
            "dtype": "float32",
            "use_flash_attention": False,
            "head_depth": head_depth,
            "head_blend": blend,
        },
        "filter": {"num_particles": 128},
    })


def _run(cfg: Config):
    src = open_source("synthetic:moving-square", 12, (192, 192))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    pos = np.array([tr.step(f)["position"] for f in frames[1:]])
    return pos, src.truth[1 : len(frames)]


def test_trunk_half_bit_exact():
    """concat features' first half == the headless forward, bit for bit."""
    spec0 = VitSpec(
        depth=2, dim=64, heads=2, mlp_dim=128, patch_size=16, image_size=64,
        dtype=jnp.float32, use_flash_attention=False, use_pos_embed=False,
    )
    spec1 = spec0._replace(head_depth=1)
    k = jax.random.key(0)
    p0, p1 = init_vit_params(k, spec0), init_vit_params(k, spec1)
    img = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    t0 = np.asarray(vit_forward_tokens(p0, img, spec0))
    t1 = np.asarray(vit_forward_tokens(p1, img, spec1))
    assert t1.shape[-1] == 2 * t0.shape[-1]
    assert np.array_equal(t0, t1[..., : t0.shape[-1]])


def test_blend_zero_trajectory_identical():
    """head_blend=0 disables the head STRUCTURALLY (config.resolve zeroes
    head_depth, params.py drops the head subtree): the tracker compiles the
    exact headless program, so the trajectory matches random init bit-for-
    bit by construction. (Keeping the head in the graph and multiplying by
    zero is NOT enough: XLA reduction reordering across two different
    programs produces ~1e-7 score differences and resampling chaos
    amplifies them within a few frames — measured.)"""
    cfg_b0 = _cfg(1, 0.0)
    assert cfg_b0.model.head_depth == 0  # structural disable
    pos_plain, _ = _run(_cfg(0, 0.5))
    pos_b0, _ = _run(cfg_b0)
    assert np.array_equal(pos_plain, pos_b0)


def test_split_cosine_blend_zero_matches_trunk():
    """The split cosine at b=0 equals the trunk-only cosine (the numeric
    half of the blend-0 guarantee, program-independent)."""
    from vitparticlefiltertracker_tpu.ops.likelihood import (
        _cos_to_template,
        l2_normalize_split,
    )

    k1, k2 = jax.random.split(jax.random.key(3))
    emb = jax.random.normal(k1, (5, 9, 32))  # [N, C, 2D], D=16
    tmpl = l2_normalize_split(jax.random.normal(k2, (9, 32)), (16, 0.0))
    cos_split = _cos_to_template(emb, tmpl, (16, 0.0))
    cos_trunk = _cos_to_template(emb[..., :16], tmpl[..., :16])
    np.testing.assert_allclose(np.asarray(cos_split), np.asarray(cos_trunk), atol=1e-6)


def test_blend_quarter_random_head_still_tracks():
    """An UNTRAINED head blended at 0.25 is just a second random matched
    filter — tracking must stay in family with the headless baseline
    (enabling the head before training costs little)."""
    pos_plain, truth = _run(_cfg(0, 0.5))
    pos_b, _ = _run(_cfg(1, 0.25))
    e_plain = np.linalg.norm(pos_plain - truth, axis=1)
    e_b = np.linalg.norm(pos_b - truth, axis=1)
    assert np.sqrt((e_b**2).mean()) < 3.0 * max(np.sqrt((e_plain**2).mean()), 4.0)


def test_head_training_freezes_trunk():
    """With head_depth > 0 the trainer updates ONLY params['head']."""
    from vitparticlefiltertracker_tpu.training.train import build_train_step

    cfg = Config.from_dict({
        "model": {"variant": "vit-t16", "image_size": 64, "dtype": "float32",
                  "use_flash_attention": False, "head_depth": 1},
        "train": {"steps": 2, "batch_size": 2, "canvas": 96, "lr": 1e-3,
                  "cloud_particles": 8, "num_random_negatives": 2},
    })
    init_fn, step_fn = build_train_step(cfg)
    params, opt = jax.jit(init_fn)()
    p0 = jax.device_get(params)
    for i in range(2):
        params, opt, m = jax.jit(step_fn)(params, opt, jnp.int32(i))
    p1 = jax.device_get(params)
    assert np.isfinite(float(np.asarray(m["loss"])))
    trunk0 = {k: v for k, v in p0.items() if k != "head"}
    trunk1 = {k: v for k, v in p1.items() if k != "head"}
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(trunk0), jax.tree.leaves(trunk1))
    ), "trunk must stay byte-frozen"
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(p0["head"]), jax.tree.leaves(p1["head"]))
    ), "head must train"


def test_head_checkpoint_roundtrip(tmp_path):
    """Save/load a head checkpoint; headless configs drop the head,
    mismatched head_depth errors."""
    from vitparticlefiltertracker_tpu.models.params import (
        load_params,
        resolve_vit_params,
        save_params,
    )

    cfg = _cfg(1, 0.5)
    spec = VitSpec.from_config(cfg.model)
    prm = init_vit_params(jax.random.key(0), spec)
    path = str(tmp_path / "head.npz")
    save_params(path, prm)
    loaded = load_params(path)
    assert "head" in loaded

    cfg.model.checkpoint = path
    resolved = resolve_vit_params(cfg)
    assert "head" in resolved

    cfg_headless = _cfg(0, 0.5)
    cfg_headless.model.checkpoint = path
    resolved0 = resolve_vit_params(cfg_headless)
    assert "head" not in resolved0  # dropped, trunk-only serving

    cfg_bad = _cfg(2, 0.5)
    cfg_bad.model.checkpoint = path
    with pytest.raises(ValueError, match="head has 1 blocks"):
        resolve_vit_params(cfg_bad)


def test_head_only_checkpoint_roundtrip(tmp_path):
    """save_params(trunk_seed=...) stores just the head; load_or_init
    regenerates the byte-frozen trunk from the seed (same backend ->
    bit-exact) and reattaches the head."""
    from vitparticlefiltertracker_tpu.models.params import (
        load_or_init,
        resolve_vit_params,
        save_params,
    )

    cfg = _cfg(1, 0.5)
    cfg.filter.seed = 7
    spec = VitSpec.from_config(cfg.model)._replace(use_pos_embed=False)
    full = load_or_init("", spec, seed=7)
    path = str(tmp_path / "head_only.npz")
    save_params(path, full, trunk_seed=7)
    # Head-only file is small: no trunk leaves stored.
    import numpy as np_

    with np_.load(path) as z:
        keys = set(z.files)
    assert all(k.startswith("head/") or k.startswith("__vpt_") for k in keys)

    cfg.model.checkpoint = path
    r = resolve_vit_params(cfg)
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(r)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="head"):
        save_params(str(tmp_path / "x.npz"), {"blocks": {}}, trunk_seed=0)


def test_banked_tracker_with_head():
    """The split-cosine plumbing must survive vmap over banks (the eval4
    multi-object geometry runs the head through MultiTracker)."""
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

    cfg = _cfg(1, 0.25)
    cfg.runtime.banks = 2
    cfg.io.source = "synthetic:moving-square"
    src = open_source(cfg.io.source, 8, (224, 224), seed=0)
    frames = list(src)
    mt = MultiTracker(cfg)
    bboxes = np.tile(np.asarray(src.init_bbox, np.float32), (2, 1))
    mt.init(frames[0], bboxes)
    for f in frames[1:]:
        recs = mt.step(f)
    pos = np.asarray([r["position"] for r in recs])
    err = np.linalg.norm(pos - src.truth[len(frames) - 1][None], axis=1)
    assert np.all(err < 20.0), (pos, src.truth[len(frames) - 1])


def test_head_training_on_imported_trunk(tmp_path):
    """model.checkpoint in a train config initializes from existing weights:
    the head trains ON TOP of an imported trunk (stand-in for a
    tools/import_vit.py checkpoint), the trunk stays frozen at the LOADED
    values, and the save is a FULL file (no trunk-seed marker — the trunk
    is not regenerable from filter.seed)."""
    from vitparticlefiltertracker_tpu.models.params import save_params
    from vitparticlefiltertracker_tpu.training.train import train_features

    # "Imported" trunk: random init under a DIFFERENT seed, saved headless.
    spec = VitSpec.from_config(_cfg(0, 0.5).model)._replace(use_pos_embed=False)
    foreign = init_vit_params(jax.random.key(12345), spec)
    src_path = str(tmp_path / "imported.npz")
    save_params(src_path, foreign)

    out_path = str(tmp_path / "head_on_imported.npz")
    cfg = Config.from_dict({
        "model": {"variant": "vit-t16", "image_size": 64, "dtype": "float32",
                  "use_flash_attention": False, "head_depth": 1,
                  "checkpoint": src_path},
        "train": {"steps": 2, "batch_size": 2, "canvas": 96, "lr": 1e-3,
                  "cloud_particles": 8, "num_random_negatives": 2,
                  "checkpoint_out": out_path, "log_every": 1},
    })
    trained = train_features(cfg, log=lambda s: None)
    for a, b in zip(
        jax.tree.leaves({k: v for k, v in foreign.items() if k != "head"}),
        jax.tree.leaves({k: v for k, v in trained.items() if k != "head"}),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            "imported trunk must stay frozen at the LOADED values"
        )
    import numpy as np_

    with np_.load(out_path) as z:
        keys = set(z.files)
    assert any(k.startswith("blocks/") for k in keys), "full save expected"
    assert "__vpt_trunk_seed__" not in keys


def test_head_requires_dense_mode():
    with pytest.raises(ValueError, match="dense"):
        Config.from_dict({
            "model": {"variant": "vit-t16", "head_depth": 1},
            "tracker": {"mode": "crop"},
        })


# ---- automatic head-blend policy (config model.head_blend_auto) -----------


def test_landscape_spread_unimodal_vs_bimodal():
    """The confusion statistic must separate the two regimes it gates on:
    a unimodal landscape (mass at one cluster) reads a small spread, a
    bimodal one (a lookalike mode inside the cloud) reads ~the mode
    separation; auto_blend_target maps them to b_min / b_max."""
    from vitparticlefiltertracker_tpu.ops.likelihood import (
        auto_blend_target,
        landscape_spread,
    )

    rng = np.random.default_rng(0)
    n = 2048
    xy = jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32))
    peak = jnp.asarray([30.0, 40.0])
    d_peak = jnp.linalg.norm(xy - peak, axis=1)
    cos_uni = jnp.exp(-(d_peak**2) / (2 * 4.0**2))
    peak2 = jnp.asarray([80.0, 70.0])
    d2 = jnp.linalg.norm(xy - peak2, axis=1)
    # Second mode 10% below the target's — still a "comparable" lookalike.
    cos_bi = jnp.maximum(cos_uni, 0.9 * jnp.exp(-(d2**2) / (2 * 4.0**2)))
    # Affine invariance: an offset+rescaled landscape must read the same.
    noise = jnp.asarray(rng.normal(0, 0.02, n).astype(np.float32))
    q = 0.35
    s_uni = float(landscape_spread(cos_uni, xy, q))
    s_bi = float(landscape_spread(cos_bi, xy, q))
    s_uni_aff = float(landscape_spread(0.6 + 0.3 * cos_uni + noise, xy, q))
    s_bi_aff = float(landscape_spread(0.6 + 0.3 * cos_bi + noise, xy, q))
    assert s_uni < 8.0 < s_bi  # bimodal ~ half the 64px mode separation
    assert s_uni_aff < 10.0 < s_bi_aff
    diag = jnp.float32(45.0)
    b_uni = float(auto_blend_target(jnp.float32(s_uni), diag, 0.25, 1.0, 0.15, 0.6))
    b_bi = float(auto_blend_target(jnp.float32(s_bi), diag, 0.25, 1.0, 0.15, 0.6))
    assert b_uni == pytest.approx(0.15)
    # The 0.9-height clone splits ~25% of the top-slice mass: spread ~ half
    # the 64px separation -> blend visibly above the floor (equal-height
    # modes at larger separation reach b_max; this one is the weak case).
    assert b_bi > 0.3


def test_landscape_spread_respects_mask():
    """Out-of-window particles' clamped-edge cosines must not fake a mode:
    masking them out must remove their contribution entirely."""
    from vitparticlefiltertracker_tpu.ops.likelihood import landscape_spread

    rng = np.random.default_rng(1)
    n = 256
    xy = jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32))
    peak = jnp.asarray([50.0, 50.0])
    cos = jnp.exp(-jnp.sum((xy - peak) ** 2, axis=1) / (2 * 3.0**2))
    # Poison half the set with perfect scores far away, then mask them.
    cos_poison = cos.at[:128].set(1.0)
    mask = jnp.arange(n) >= 128
    s_clean = float(landscape_spread(cos[128:], xy[128:], 0.35))
    s_masked = float(landscape_spread(cos_poison, xy, 0.35, mask=mask))
    assert s_masked == pytest.approx(s_clean, rel=1e-5)


def _cfg_auto(**model_extra) -> Config:
    d = {
        "model": {
            "variant": "vit-t16",
            "image_size": 64,
            "dtype": "float32",
            "use_flash_attention": False,
            "head_depth": 1,
            "head_blend": 0.5,
        },
        "filter": {"num_particles": 128},
    }
    d["model"].update(model_extra)
    return Config.from_dict(d)


def test_auto_blend_pinned_bounds_bit_exact_vs_static():
    """With min == max == the static blend, the auto policy is a plumbing
    no-op: the trajectory must be BIT-IDENTICAL to the static-blend tracker
    (same fused per-half scorers, same blend arithmetic, only the blend
    scalar's provenance differs)."""
    pos_static, _ = _run(_cfg(1, 0.5))
    pos_auto, _ = _run(
        _cfg_auto(head_blend_auto=True, head_blend_min=0.5, head_blend_max=0.5)
    )
    assert np.array_equal(pos_static, pos_auto)


def test_auto_blend_adapts_and_stays_bounded():
    """On a clean unimodal clip the running blend must fall from its 0.5
    init toward head_blend_min, never leaving [min, max]."""
    cfg = _cfg_auto(
        head_blend_auto=True, head_blend_min=0.15, head_blend_max=0.6
    )
    src = open_source("synthetic:moving-square", 12, (192, 192))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    assert float(tr.state.blend) == -1.0  # unseeded sentinel
    blends = []
    for f in frames[1:]:
        tr.step(f)
        blends.append(float(tr.state.blend))
    assert all(0.15 - 1e-6 <= b <= 0.6 + 1e-6 for b in blends)
    assert blends[-1] < 0.3  # converged toward b_min on a unimodal scene


def test_auto_blend_state_checkpoint_roundtrip(tmp_path):
    from vitparticlefiltertracker_tpu.runtime.tracker import (
        load_tracker_state,
        save_tracker_state,
    )

    cfg = _cfg_auto(head_blend_auto=True)
    src = open_source("synthetic:moving-square", 6, (192, 192))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    for f in frames[1:4]:
        tr.step(f)
    p = str(tmp_path / "state.npz")
    save_tracker_state(p, tr.state)
    loaded = load_tracker_state(p)
    assert np.array_equal(np.asarray(loaded.blend), np.asarray(tr.state.blend))


def test_auto_blend_requires_head():
    with pytest.raises(ValueError, match="head_blend_auto"):
        Config.from_dict(
            {"model": {"variant": "vit-t16", "head_blend_auto": True}}
        ).resolve()
