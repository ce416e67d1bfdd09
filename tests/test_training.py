"""Feature-training subsystem (training/): data generator, objective, loop.

The reference ships no weights (SURVEY.md §0); training/ learns them in-repo.
These tests pin the on-device generator's contract, the objective's
gradient flow through the inference embedder, and the end-to-end loop's
checkpoint interop with the Tracker.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.training.data import make_pair_batch
from vitparticlefiltertracker_tpu.training.objective import batch_loss, ring_offsets
from vitparticlefiltertracker_tpu.training.train import (
    _decay_mask,
    build_train_step,
    train_features,
)


def tiny_train_cfg(**train_over):
    d = {
        "model": {"variant": "custom", "depth": 2, "dim": 64, "heads": 2,
                  "mlp_dim": 128, "patch_size": 16, "image_size": 64,
                  "dtype": "float32", "use_flash_attention": False},
        "train": {"steps": 8, "batch_size": 4, "canvas": 96, "window": 64,
                  "lr": 1e-3, "warmup": 2, "log_every": 4,
                  "checkpoint_out": ""},
    }
    d["train"].update(train_over)
    return Config.from_dict(d)


def test_pair_batch_shapes_and_ranges():
    b = make_pair_batch(jax.random.key(0), batch=3, size=96)
    assert b.frame0.shape == (3, 96, 96, 3) and b.frame1.shape == (3, 96, 96, 3)
    assert b.p0.shape == (3, 2) and b.wh.shape == (3, 2)
    f0 = np.asarray(b.frame0)
    assert f0.min() >= 0.0 and f0.max() <= 255.0
    assert float(f0.std()) > 10.0  # textured, not blank
    # Targets inside the frame with margin.
    assert np.all(np.asarray(b.p1) > 0.1 * 96) and np.all(np.asarray(b.p1) < 0.9 * 96)
    assert np.all(np.asarray(b.wh) >= 5.0)


def test_pair_batch_counter_deterministic():
    a = make_pair_batch(jax.random.key(7), 2, 64)
    b = make_pair_batch(jax.random.key(7), 2, 64)
    np.testing.assert_array_equal(np.asarray(a.frame1), np.asarray(b.frame1))
    c = make_pair_batch(jax.random.key(8), 2, 64)
    assert np.abs(np.asarray(a.frame1) - np.asarray(c.frame1)).mean() > 1.0


def test_ring_offsets_cover_fine_and_clear_radii():
    offs = np.asarray(ring_offsets())
    assert offs.shape == (40, 2)
    r = np.linalg.norm(offs, axis=1)
    # Fine overlapping negatives (localization sharpness at particle-cloud
    # scale) ...
    assert np.isclose(r.min(), 0.3, atol=1e-5)
    # ... through clearly-separated ones (discrimination range).
    assert r.max() >= 3.0 - 1e-6
    # Never closer than the template jitter scale (label ambiguity).
    assert np.all(r >= 0.25)


def test_decay_mask_kernels_only():
    cfg = tiny_train_cfg()
    init_fn, _ = build_train_step(cfg)
    params, _ = jax.jit(init_fn)()
    mask = _decay_mask(params)
    assert mask["patch_embed"]["kernel"] is True
    assert mask["patch_embed"]["bias"] is False
    assert mask["blocks"]["attn"]["wqkv"] is True
    assert mask["blocks"]["ln1"]["scale"] is False
    assert mask["pos_embed"] is False


def test_train_step_reduces_loss_and_flows_grads():
    cfg = tiny_train_cfg(steps=2)
    init_fn, step_fn = build_train_step(cfg)
    params, opt = jax.jit(init_fn)()
    step_jit = jax.jit(step_fn)
    p0 = params["patch_embed"]["kernel"].copy()
    params, opt, metrics = step_jit(params, opt, jnp.int32(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0.0
    # Step 0 applies LR 0 (warmup ramp starts at zero); step 1 must move the
    # weights — the gradient reaches the patch embed through the whole
    # window->ViT->ROI->cosine->softmax chain.
    params, opt, metrics = step_jit(params, opt, jnp.int32(1))
    assert np.abs(np.asarray(params["patch_embed"]["kernel"]) - np.asarray(p0)).max() > 0


def test_sharded_train_step_matches_unsharded():
    """Data-parallel training over an 8-device ("data",) mesh: params stay
    replicated, the batch shards, GSPMD inserts the gradient AllReduce —
    and the result matches the single-device step (same on-device data
    generation, deterministic keys)."""
    import jax

    from vitparticlefiltertracker_tpu.training.train import make_data_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 (fake) devices")
    cfg = tiny_train_cfg(batch_size=8)
    init_fn, step_ref = build_train_step(cfg, mesh=None)
    _, step_dp = build_train_step(cfg, mesh=make_data_mesh(8))

    params, opt = jax.jit(init_fn)()
    p_ref, _, m_ref = jax.jit(step_ref)(params, opt, jnp.int32(1))
    p_dp, _, m_dp = jax.jit(step_dp)(params, opt, jnp.int32(1))
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_dp["loss"]), rtol=1e-4
    )
    a = np.asarray(p_ref["patch_embed"]["kernel"])
    b = np.asarray(p_dp["patch_embed"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_train_features_end_to_end_checkpoint_tracks(tmp_path):
    """Trained checkpoint loads via model.checkpoint and the tracker runs."""
    ckpt = str(tmp_path / "trained.npz")
    cfg = tiny_train_cfg(steps=6, checkpoint_out=ckpt)
    lines = []
    train_features(cfg, log=lines.append)
    assert any("loss" in s for s in lines)

    from vitparticlefiltertracker_tpu.io.video import open_source
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

    tcfg = Config.from_dict({
        "model": {"variant": "custom", "depth": 2, "dim": 64, "heads": 2,
                  "mlp_dim": 128, "patch_size": 16, "image_size": 64,
                  "dtype": "float32", "use_flash_attention": False,
                  "checkpoint": ckpt},
        "filter": {"num_particles": 64},
        "tracker": {"mode": "dense"},
    })
    src = open_source("synthetic:moving-square", 5, (128, 128))
    frames = list(src)
    tr = Tracker(tcfg)
    tr.init(frames[0], src.init_bbox)
    recs = [tr.step(f) for f in frames[1:]]
    assert all(np.isfinite(r["position"]).all() for r in recs)


def test_train_features_metrics_out_writes_jsonl(tmp_path):
    """Regression: metrics_out crashed with UnboundLocalError (os was only
    imported locally under checkpoint_out — round-2 commit 3673a0f). Both
    shipped train configs set metrics_out, so this path must run."""
    import json

    metrics = str(tmp_path / "sub" / "metrics.jsonl")
    cfg = tiny_train_cfg(steps=4, log_every=2, metrics_out=metrics)
    train_features(cfg, log=lambda s: None)
    rows = [json.loads(l) for l in open(metrics)]
    assert len(rows) == 2
    assert all("loss" in r and np.isfinite(r["loss"]) for r in rows)
    assert rows[-1]["step"] == 4


def test_probe_applies_lookalikes_robustness_gates():
    """training/probe.py PROBE_OVERRIDES: the lookalikes probe must run
    under the eval's robustness stack (relative lost gate, global
    re-detection, re-lock hysteresis) — without it checkpoint selection
    measures drift-onto-impostor with no escape path — while ungated clips
    share one plain tracker. Tiny geometry keeps the probe a few seconds."""
    from vitparticlefiltertracker_tpu.models.vit import init_vit_params
    from vitparticlefiltertracker_tpu.models.embedder import DenseEmbedSpec
    from vitparticlefiltertracker_tpu.training.probe import (
        PROBE_OVERRIDES,
        make_probe,
    )

    assert "tracker.relock_conf_ratio" in PROBE_OVERRIDES["lookalikes"]
    cfg = Config.from_dict({
        "model": {"variant": "vit-t16", "image_size": 64,
                  "dtype": "float32", "use_flash_attention": False},
        "train": {"batch_size": 4, "canvas": 96, "window": 64},
    })
    probe = make_probe(
        cfg,
        clips=("moving-square", "lookalikes"),
        frames=5,
        frame_size=(128, 128),
        num_particles=64,
        image_size=64,
    )
    params = init_vit_params(
        jax.random.PRNGKey(0), DenseEmbedSpec.from_config(cfg).vit
    )
    out = probe(params)
    assert set(out) == {"probe_moving-square", "probe_lookalikes", "probe_rmse"}
    assert all(np.isfinite(v) for v in out.values())


def test_freeze_prefix_pins_early_layers():
    """train.freeze_prefix: patch/pos embed and the first N stacked blocks
    must be BITWISE untouched (including AdamW's decoupled weight decay),
    while the top blocks and final LN train."""
    cfg = tiny_train_cfg(steps=3, freeze_prefix=1)
    init_fn, step_fn = build_train_step(cfg)
    params, opt = init_fn()
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    step_jit = jax.jit(step_fn)
    for i in range(3):
        params, opt, _ = step_jit(params, opt, jnp.int32(i))
    params = jax.device_get(params)
    assert np.array_equal(p0["patch_embed"]["kernel"], params["patch_embed"]["kernel"])
    assert np.array_equal(p0["pos_embed"], params["pos_embed"])
    # Block 0 frozen (leading depth-axis slice), block 1 trained.
    assert np.array_equal(
        p0["blocks"]["attn"]["wqkv"][0], params["blocks"]["attn"]["wqkv"][0]
    )
    assert not np.array_equal(
        p0["blocks"]["attn"]["wqkv"][1], params["blocks"]["attn"]["wqkv"][1]
    )
    with np.testing.assert_raises(ValueError):
        build_train_step(tiny_train_cfg(freeze_prefix=2))  # depth 2 model


def test_blur_augmentation():
    """train.blur_prob: codec-like low-pass (training/data.py:_sep_blur) —
    blurred samples lose high-frequency energy, non-blurred are untouched,
    and the probe's +blur clip variant stages a blurred copy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vitparticlefiltertracker_tpu.training.data import _sep_blur
    from vitparticlefiltertracker_tpu.training.probe import _blur_clip

    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (32, 32, 3)), jnp.float32
    )
    out_on = np.asarray(_sep_blur(img, jnp.float32(1.0), jnp.float32(1.0)))
    out_off = np.asarray(_sep_blur(img, jnp.float32(1.0), jnp.float32(0.0)))
    assert np.array_equal(out_off, np.asarray(img))
    assert np.isfinite(out_on).all()
    # blur removes variance (high-frequency energy)
    assert out_on.std() < np.asarray(img).std() * 0.9
    # energy preserved (kernel sums to 1, edge-padded)
    assert abs(out_on.mean() - np.asarray(img).mean()) < 2.0

    clip = np.random.default_rng(1).integers(0, 255, (3, 16, 16, 3)).astype(np.uint8)
    bl = _blur_clip(clip, 1.0)
    assert bl.shape == clip.shape and bl.dtype == np.uint8
    assert bl.astype(np.float32).std() < clip.astype(np.float32).std()
