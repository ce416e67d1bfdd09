"""End-to-end tracker tests (SURVEY.md §4.2 integration tier).

Small ViT (tiny/64px) keeps CPU runtime manageable; the contract tested is
the reference's: video in -> per-frame positions out (README.md:42), with
RMSE, determinism, and banked multi-object coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.runtime.tracker import Tracker


def tiny_cfg(**over):
    d = {
        "model": {
            "variant": "vit-t16",
            "image_size": 128,
            "dtype": "float32",
            "use_flash_attention": False,
        },
        "filter": {"num_particles": 256, "motion": {"sigma_pos": 3.0}},
        "tracker": {"mode": "dense"},
        "io": {
            "source": "synthetic:moving-square",
            "num_frames": 20,
            "frame_size": [224, 224],
        },
    }
    for k, v in over.items():
        for kk, vv in v.items():
            d.setdefault(k, {})[kk] = vv
    return Config.from_dict(d)


def run_clip(cfg, seed=0):
    src = open_source(cfg.io.source, cfg.io.num_frames, tuple(cfg.io.frame_size), seed=seed)
    tr = Tracker(cfg)
    recs = list(tr.run(src))
    errs = [
        np.hypot(r["position"][0] - src.truth[r["frame"]][0],
                 r["position"][1] - src.truth[r["frame"]][1])
        for r in recs
    ]
    return recs, np.asarray(errs)


def test_tracks_synthetic_target_dense():
    cfg = tiny_cfg()
    recs, errs = run_clip(cfg)
    rmse = float(np.sqrt(np.mean(errs**2)))
    assert rmse < 10.0, f"RMSE {rmse}, errs {errs}"
    assert np.mean(errs[-5:]) < 10.0  # stays locked at the end
    # conf is the mean per-cell cosine under the default structured
    # appearance — locked values sit ~0.5-0.8 (lower than pooled cosine).
    assert all(r["conf"] > 0.4 for r in recs)


def test_tracks_synthetic_target_crop_mode():
    cfg = tiny_cfg(tracker={"mode": "crop", "crop_size": 32})
    recs, errs = run_clip(cfg)
    rmse = float(np.sqrt(np.mean(errs**2)))
    assert rmse < 12.0, f"RMSE {rmse}, errs {errs}"


def test_tracks_synthetic_target_crop_window_impl():
    """Two-stage window crop path (the Pallas kernel's semantics) tracks too."""
    cfg = tiny_cfg(
        tracker={"mode": "crop", "crop_size": 32, "crop_impl": "window",
                 "window_size": 128}
    )
    recs, errs = run_clip(cfg)
    rmse = float(np.sqrt(np.mean(errs**2)))
    assert rmse < 12.0, f"RMSE {rmse}, errs {errs}"


def test_track_clip_matches_sequential_steps():
    """lax.scan whole-clip tracking == frame-by-frame step() bitwise."""
    import jax.numpy as jnp

    cfg = tiny_cfg()
    src = open_source(cfg.io.source, 9, tuple(cfg.io.frame_size), seed=0)
    frames = list(src)

    tr_a = Tracker(cfg)
    tr_a.init(frames[0], src.init_bbox)
    seq = [tr_a.step(f) for f in frames[1:]]

    tr_b = Tracker(cfg)
    tr_b.init(frames[0], src.init_bbox)
    outs = tr_b.track_clip_device(jnp.asarray(np.stack(frames[1:])))
    pos = np.asarray(outs.position)
    ess = np.asarray(outs.ess)
    # Near-exact: the scan body and the standalone step are separately
    # compiled programs, and XLA may fuse/reassociate reductions differently
    # (observed ~1e-5 px). Semantics (RNG draws, resample decisions) are
    # identical.
    for i, r in enumerate(seq):
        np.testing.assert_allclose(pos[i], r["position"], atol=1e-3, rtol=1e-6)
        np.testing.assert_allclose(ess[i], r["ess"], atol=0.1)
        assert bool(np.asarray(outs.resampled)[i]) == r["resampled"]
    np.testing.assert_allclose(
        np.asarray(tr_a.state.pf.particles),
        np.asarray(tr_b.state.pf.particles),
        atol=1e-2,
    )


def test_banked_tracks_distinct_targets():
    """Each bank locks onto ITS target on a true multi-object clip
    (synthetic:multi-K — the reference's surveillance case, README.md:50)."""
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker
    import jax.numpy as jnp

    k = 3
    cfg = tiny_cfg(runtime={"banks": k}, io={"frame_size": [224, 288]})
    src = open_source(f"synthetic:multi-{k}", 16, (224, 288), seed=0)
    frames = list(src)
    mt = MultiTracker(cfg)
    mt.init(frames[0], src.init_bbox)  # [K, 4]
    outs = mt.track_clip_device(jnp.asarray(np.stack(frames[1:])))
    pos = np.asarray(outs.position)  # [T-1, K, 2]
    err = np.linalg.norm(pos - src.truth[1:], axis=-1)  # [T-1, K]
    rmse = np.sqrt((err**2).mean(axis=0))
    assert (rmse < 15.0).all(), rmse
    # And each bank is closer to its own target than to any other target.
    final = pos[-1]
    d_own = np.linalg.norm(final - src.truth[-1], axis=-1)
    for i in range(k):
        d_other = np.linalg.norm(final[i] - np.delete(src.truth[-1], i, 0), axis=-1)
        assert d_own[i] < d_other.min(), (i, d_own[i], d_other)


def test_banked_track_clip_shapes():
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker
    import jax.numpy as jnp

    cfg = tiny_cfg(runtime={"banks": 3})
    src = open_source(cfg.io.source, 6, tuple(cfg.io.frame_size), seed=0)
    frames = list(src)
    mt = MultiTracker(cfg)
    mt.init(frames[0], np.tile(src.init_bbox, (3, 1)))
    outs = mt.track_clip_device(jnp.asarray(np.stack(frames[1:])))
    assert np.asarray(outs.position).shape == (5, 3, 2)
    assert np.isfinite(np.asarray(outs.position)).all()


def test_determinism_same_seed():
    cfg = tiny_cfg()
    cfg.io.num_frames = 8
    recs1, _ = run_clip(cfg)
    recs2, _ = run_clip(cfg)
    for a, b in zip(recs1, recs2):
        assert a["position"] == b["position"]
        assert a["resampled"] == b["resampled"]


def test_different_seed_different_trajectory():
    cfg = tiny_cfg()
    cfg.io.num_frames = 8
    recs1, _ = run_clip(cfg)
    cfg.filter.seed = 123
    recs3, _ = run_clip(cfg)
    assert any(a["position"] != b["position"] for a, b in zip(recs1, recs3))


def test_occlusion_clip_recovers():
    """Eval config 2's occlusion scenario (BASELINE.md): tracker survives a
    sweep occluder — ESS drops, then re-locks within a few frames. Runs
    the production robustness stack (relative lost gate, as the eval-2
    config and tools/eval_quality.py do) at zscale 6: the z9 default is
    measured best at the FLAGSHIP geometry (480x640 ViT-B — occlusion
    final5 1.3 px on TPU, docs/quality_runs.jsonl), but this test's tiny
    vit-t16/128px feature space is weak enough that z9 over-commits to
    the occluder edge — a geometry no shipped config runs."""
    cfg = tiny_cfg(
        io={"source": "synthetic:occlusion", "num_frames": 30},
        filter={"lost_conf_ratio": 0.5, "likelihood_zscale": 6.0},
    )
    recs, errs = run_clip(cfg)
    # end of clip (post occlusion) within threshold
    assert np.mean(errs[-5:]) < 14.0, errs[-5:]


def test_global_redetection_recovers_teleport():
    """A target that exits the search window entirely during occlusion is
    unrecoverable by the local window/noise boost (round-1 VERDICT missing
    #4); the global grid scan re-seeds the cloud at the reappearance point."""
    from vitparticlefiltertracker_tpu.io.synthetic import teleport_times

    def run(redetect_after):
        cfg = Config.from_dict({
            "model": {"variant": "vit-t16", "image_size": 64,
                      "dtype": "float32", "use_flash_attention": False},
            "filter": {"num_particles": 256, "lost_conf_threshold": 0.6},
            "tracker": {"mode": "dense",
                        "redetect_global_after": redetect_after,
                        "redetect_accept_conf": 0.3,
                        "redetect_global_grid": 5},
        })
        src = open_source("synthetic:teleport", 40, (192, 192))
        frames = list(src)
        tr = Tracker(cfg)
        tr.init(frames[0], src.init_bbox)
        recs = [tr.step(f) for f in frames[1:]]
        pos = np.array([r["position"] for r in recs])
        return np.linalg.norm(pos - src.truth[1:], axis=1)

    _, t_show = teleport_times(40)
    err_off = run(0)
    err_on = run(3)
    # Without global re-detection the tracker stays stuck near the
    # disappearance point — demonstrating the local boost is insufficient.
    assert err_off[t_show + 4 :].mean() > 50.0, err_off[t_show + 4 :]
    # With it, the cloud re-seeds at the reappearance point and re-locks.
    assert err_on[t_show + 4 :].mean() < 15.0, err_on[t_show + 4 :]


def test_redetect_accept_ratio_recovers_teleport():
    """tracker.redetect_accept_ratio: the feature-agnostic acceptance gate
    (winner cosine vs the locked-state confidence EMA) recovers the teleport
    where an absolute redetect_accept_conf ABOVE the feature set's cosine
    scale vetoes every re-seed (round 3: trained features sat 68%-lost on
    the flagship teleport because the 0.25 absolute gate tuned on random
    init exceeded their locked confidence)."""
    from vitparticlefiltertracker_tpu.io.synthetic import teleport_times

    def run(accept_over):
        cfg = Config.from_dict({
            "model": {"variant": "vit-t16", "image_size": 64,
                      "dtype": "float32", "use_flash_attention": False},
            "filter": {"num_particles": 256, "lost_conf_threshold": 0.6},
            "tracker": {"mode": "dense",
                        "redetect_global_after": 3,
                        "redetect_global_grid": 5,
                        **accept_over},
        })
        src = open_source("synthetic:teleport", 40, (192, 192))
        frames = list(src)
        tr = Tracker(cfg)
        tr.init(frames[0], src.init_bbox)
        recs = [tr.step(f) for f in frames[1:]]
        pos = np.array([r["position"] for r in recs])
        return np.linalg.norm(pos - src.truth[1:], axis=1)

    _, t_show = teleport_times(40)
    # An absolute gate above this feature set's cosine scale vetoes every
    # re-seed — the cloud never recovers (the failure mode the ratio fixes).
    err_abs = run({"redetect_accept_conf": 0.99})
    assert err_abs[t_show + 4 :].mean() > 50.0, err_abs[t_show + 4 :]
    # The relative gate accepts and re-locks. 0.35: the global scan's
    # winning cosine sits well below LOCKED confidence even for the true
    # target (tile windows sample at coarser scale), so the ratio is
    # calibrated to the scan channel — 0.35 x locked EMA ~= the absolute
    # 0.3 gate that works for random init at this geometry, and scales
    # with the feature set where the absolute gate does not.
    err_rel = run({"redetect_accept_ratio": 0.35})
    assert err_rel[t_show + 4 :].mean() < 15.0, err_rel[t_show + 4 :]


def test_relative_lost_gate():
    """filter.lost_conf_ratio: the feature-agnostic lost gate (confidence
    vs its running locked-state EMA) must trip on disappearance and clear
    on reappearance WITHOUT any absolute cosine threshold — absolute
    thresholds are feature-distribution dependent (0.6 tuned on random
    init sits exactly at trained features' locked confidence and mis-fires;
    flagship occlusion traces, round 2). Blanked frames guarantee the
    confidence dip at the tiny test geometry, where max-cosine against a
    textured background otherwise stays high for any template."""
    cfg = Config.from_dict({
        "model": {"variant": "vit-t16", "image_size": 64,
                  "dtype": "float32", "use_flash_attention": False},
        # 0.4: the tiny geometry's locked confidence decays ~0.85 -> 0.5
        # (weak vit-t16/64px features) while the EMA baseline lags at
        # ~0.73, so re-lock must clear 0.4 x baseline. Flagship locked
        # confidence is stable; 0.5-0.6 is the production ratio there.
        "filter": {"num_particles": 256, "lost_conf_ratio": 0.4},
        "tracker": {"mode": "dense"},
    })
    src = open_source("synthetic:moving-square", 20, (192, 192))
    frames = list(src)
    for t in range(8, 12):  # total dropout: flat gray frames
        frames[t] = np.full_like(frames[t], 120)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    recs = [tr.step(f) for f in frames[1:]]
    lost = np.array([r["lost"] for r in recs])  # recs[i] <- frames[i+1]
    assert not lost[:6].any(), lost  # locked while the target is visible
    assert lost[8:11].all(), lost  # trips on the blank frames
    # Re-arms after reappearance: the unboosted probe restores the
    # confidence scale the frozen baseline was set at (a boosted-window
    # confidence would self-lock the lost state).
    assert not lost[-4:].all(), lost


def test_relock_hysteresis_blocks_marginal_relock():
    """tracker.relock_conf_ratio: once lost, the flag must NOT clear on a
    marginally-confident match (the false-lock geometry: a lookalike
    impostor the boosted cloud drifted onto probes above the loose lost
    gate), but must still clear once full-confidence tracking returns.
    Blank frames force lost; noise-blended frames then give a marginal
    confidence band (above the 0.4 lost gate x baseline, below the 0.6
    re-lock bar); clean frames restore full confidence."""

    def run(relock):
        cfg = Config.from_dict({
            "model": {"variant": "vit-t16", "image_size": 64,
                      "dtype": "float32", "use_flash_attention": False},
            "filter": {"num_particles": 256, "lost_conf_ratio": 0.4},
            "tracker": {"mode": "dense", "relock_conf_ratio": relock},
        })
        src = open_source("synthetic:moving-square", 24, (192, 192))
        frames = list(src)
        rng = np.random.default_rng(0)
        for t in range(8, 12):  # dropout: forces the lost gate
            frames[t] = np.full_like(frames[t], 120)
        for t in range(12, 17):  # marginal band: noise-degraded target
            n = rng.integers(0, 255, frames[t].shape).astype(np.float32)
            frames[t] = (0.35 * frames[t].astype(np.float32) + 0.65 * n
                         ).astype(np.uint8)
        tr = Tracker(cfg)
        tr.init(frames[0], src.init_bbox)
        return np.array([tr.step(f)["lost"] for f in frames[1:]])

    lost_off = run(0.0)
    lost_hys = run(0.6)
    # Both trip on the blank frames (recs[i] <- frames[i+1]).
    assert lost_off[8:11].all() and lost_hys[8:11].all()
    # Without hysteresis the marginal noise band re-locks at least once —
    # the failure mode: any in-window object above the loose gate becomes
    # the new lock with no appearance scrutiny.
    assert not lost_off[12:19].all(), lost_off
    # With it the flag holds through the ENTIRE marginal band...
    assert lost_hys[11:19].all(), lost_hys
    # ...and still clears once clean full-confidence frames return.
    assert not lost_hys[-3:].all(), lost_hys


def test_banked_multitracker():
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

    cfg = tiny_cfg()
    cfg.runtime.banks = 4
    src = open_source(cfg.io.source, 8, (224, 224), seed=0)
    frames = list(src)
    mt = MultiTracker(cfg)
    bboxes = np.tile(np.asarray(src.init_bbox, np.float32), (4, 1))
    mt.init(frames[0], bboxes)
    for f in frames[1:]:
        recs = mt.step(f)
    assert len(recs) == 4
    # all banks track the same target -> similar final positions
    pos = np.asarray([r["position"] for r in recs])
    t = src.truth[len(frames) - 1]
    err = np.linalg.norm(pos - t[None], axis=1)
    assert np.all(err < 15.0), (pos, t)


def test_banked_sharded_on_mesh():
    """B11: banked tracker on a ("bank","particle") mesh over 8 fake devices."""
    from vitparticlefiltertracker_tpu.parallel.mesh import make_mesh
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tiny_cfg()
    cfg.model.image_size = 64
    cfg.filter.num_particles = 64
    cfg.runtime.banks = 2
    mesh = make_mesh(2, 4)
    src = open_source(cfg.io.source, 6, (224, 224), seed=0)
    frames = list(src)
    mt = MultiTracker(cfg, mesh=mesh)
    mt.init(frames[0], np.tile(np.asarray(src.init_bbox, np.float32), (2, 1)))
    for f in frames[1:]:
        recs = mt.step(f)
    assert len(recs) == 2
    assert all(np.isfinite(r["position"]).all() for r in recs)


def test_sharded_matches_unsharded():
    """Same seed: mesh-sharded and single-device runs agree (SURVEY.md §7
    determinism across 1-chip / n-chip)."""
    from vitparticlefiltertracker_tpu.parallel.mesh import make_mesh
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tiny_cfg()
    cfg.model.image_size = 64
    cfg.filter.num_particles = 64
    cfg.runtime.banks = 2
    src = open_source(cfg.io.source, 5, (224, 224), seed=0)
    frames = list(src)
    bboxes = np.tile(np.asarray(src.init_bbox, np.float32), (2, 1))

    def run(mesh):
        mt = MultiTracker(cfg, mesh=mesh)
        mt.init(frames[0], bboxes)
        out = [mt.step(f) for f in frames[1:]]
        return np.asarray([[r["position"] for r in recs] for recs in out])

    a = run(None)
    b = run(make_mesh(2, 4))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_tensor_parallel_matches_replicated():
    """ViT tensor parallelism over the "model" mesh axis (SURVEY.md §2.2):
    sharding heads/MLP-hidden must not change the trajectory."""
    from vitparticlefiltertracker_tpu.parallel.mesh import make_mesh
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tiny_cfg(
        model={"variant": "custom", "depth": 2, "dim": 64, "heads": 4,
               "mlp_dim": 128, "image_size": 64},
        filter={"num_particles": 64},
        runtime={"banks": 2},
    )
    src = open_source(cfg.io.source, 5, (224, 224), seed=0)
    frames = list(src)
    bboxes = np.tile(np.asarray(src.init_bbox, np.float32), (2, 1))

    def run(mesh):
        mt = MultiTracker(cfg, mesh=mesh)
        mt.init(frames[0], bboxes)
        out = [mt.step(f) for f in frames[1:]]
        return np.asarray([[r["position"] for r in recs] for recs in out])

    a = run(make_mesh(2, 2, 1))  # replicated weights
    b = run(make_mesh(2, 2, 2))  # heads/MLP sharded over "model"
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_vit_param_sharding_specs():
    """TP sharding rules hit the right leaves (unit-level, no mesh compute)."""
    from jax.sharding import PartitionSpec as P
    from vitparticlefiltertracker_tpu.models.vit import VitSpec, init_vit_params
    from vitparticlefiltertracker_tpu.parallel.mesh import make_mesh, vit_param_sharding

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(1, 4, 2)
    spec = VitSpec(depth=2, dim=64, heads=4, mlp_dim=128, image_size=32)
    params = init_vit_params(jax.random.key(0), spec)
    sh = vit_param_sharding(mesh, params)
    assert sh["blocks"]["attn"]["wqkv"].spec == P(None, None, "model")
    assert sh["blocks"]["attn"]["wo"].spec == P(None, "model", None)
    assert sh["blocks"]["mlp"]["w1"].spec == P(None, None, "model")
    assert sh["blocks"]["mlp"]["b1"].spec == P(None, "model")
    assert sh["blocks"]["mlp"]["w2"].spec == P(None, "model", None)
    assert sh["blocks"]["ln1"]["scale"].spec == P()
    assert sh["patch_embed"]["kernel"].spec == P()


def test_reinit_bank_retargets_without_touching_others():
    """Dynamic multi-object management: re-point one bank mid-stream; the
    other banks' posteriors must be unaffected (README.md:50 surveillance —
    objects enter/leave)."""
    from vitparticlefiltertracker_tpu.runtime.banked import MultiTracker

    cfg = tiny_cfg(runtime={"banks": 2}, io={"frame_size": [224, 288]})
    src = open_source("synthetic:multi-2", 16, (224, 288), seed=0)
    frames = list(src)
    # Both banks start on target 0.
    b0 = src.init_bbox[0]

    def run(reinit: bool):
        mt = MultiTracker(cfg)
        mt.init(frames[0], np.stack([b0, b0]))
        recs = []
        for i, f in enumerate(frames[1:], start=1):
            if reinit and i == 6:
                # Re-target bank 1 onto target 1 at its current true box.
                c = src.truth[i - 1, 1]
                w, h = src.init_bbox[1, 2:]
                mt.reinit_bank(1, frames[i - 1], [c[0] - w / 2, c[1] - h / 2, w, h])
            recs.append(mt.step(f))
        return mt, recs

    _, recs_a = run(reinit=False)
    _, recs_b = run(reinit=True)

    # Bank 0 identical with/without the bank-1 reinit.
    for ra, rb in zip(recs_a, recs_b):
        np.testing.assert_array_equal(ra[0]["position"], rb[0]["position"])
    # Bank 1 ends locked on target 1 (reinit run) vs target 0 (control run).
    final_b = np.asarray(recs_b[-1][1]["position"])
    t0, t1 = src.truth[-1]
    assert np.linalg.norm(final_b - t1) < 12.0, (final_b, t1)
    assert np.linalg.norm(final_b - t1) < np.linalg.norm(final_b - t0)


def test_estimate_mode_tracks():
    """tracker.estimate: 'mode' (highest-weight particle) also locks on."""
    cfg = tiny_cfg(tracker={"estimate": "mode"})
    recs, errs = run_clip(cfg)
    rmse = float(np.sqrt(np.mean(errs**2)))
    assert rmse < 12.0, f"RMSE {rmse}"


def test_multistream_matches_independent_trackers():
    """K streams in one batched step == K separate Trackers, bitwise-close."""
    from vitparticlefiltertracker_tpu.runtime.banked import MultiStreamTracker
    import jax
    import jax.numpy as jnp

    # ess_threshold=0 disables resampling: no boundary-pick forks, so the
    # two separately-compiled programs must agree to float tolerance.
    cfg = tiny_cfg(filter={"num_particles": 64, "ess_threshold": 0.0})
    cfg.model.image_size = 64
    k = 3
    srcs = [
        open_source("synthetic:moving-square", 7, (128, 128), seed=s)
        for s in range(k)
    ]
    clips = [np.stack(list(s)) for s in srcs]

    # Independent single-stream runs: SHARED ViT weights (filter.seed seeds
    # both the weights and the PF — the multistream tracker uses one weight
    # set with per-stream PF seeds, so the singles must too).
    from vitparticlefiltertracker_tpu.models.params import load_or_init
    from vitparticlefiltertracker_tpu.models.vit import VitSpec

    shared_params = load_or_init("", VitSpec.from_config(cfg.model), cfg.filter.seed)
    singles = []
    for i in range(k):
        c2 = tiny_cfg(filter={"num_particles": 64, "ess_threshold": 0.0,
                              "seed": cfg.filter.seed + i})
        c2.model.image_size = 64
        tr = Tracker(c2, vit_params=shared_params)
        tr.init(clips[i][0], srcs[i].init_bbox)
        singles.append([tr.step(f)["position"] for f in clips[i][1:]])

    # Batched multi-stream run.
    ms = MultiStreamTracker(cfg, num_streams=k)
    ms.init(
        np.stack([c[0] for c in clips]),
        np.stack([s.init_bbox for s in srcs]),
    )
    batch = jnp.asarray(np.stack([c[1:] for c in clips], axis=1))  # [T,K,H,W,3]
    outs = ms.track_clips_device(batch)
    pos = np.asarray(outs.position)  # [T, K, 2]

    # The vmapped program is a separate XLA compilation (sub-ulp reduction
    # reassociation), so "equal" means float-tolerance, not bitwise.
    for i in range(k):
        for t_i in range(6):
            np.testing.assert_allclose(
                pos[t_i, i], singles[i][t_i], atol=1e-2,
            )


def test_lost_output_coasts_no_jumps():
    """Lost-aware output (round-3): while the lost flag is up, the emitted
    position coasts on last-locked position+velocity — it must not jump
    more than a box size per frame (the posterior mean under boosted
    exploration noise did: 49-70 px excursions, docs/QUALITY.md r2)."""
    cfg = Config.from_dict({
        "model": {"variant": "vit-t16", "image_size": 64,
                  "dtype": "float32", "use_flash_attention": False},
        "filter": {"num_particles": 256, "lost_conf_ratio": 0.4},
        "tracker": {"mode": "dense"},
    })
    src = open_source("synthetic:moving-square", 20, (192, 192))
    frames = list(src)
    for t in range(8, 14):
        frames[t] = np.full_like(frames[t], 120)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    recs = [tr.step(f) for f in frames[1:]]
    lost = np.array([r["lost"] for r in recs])
    assert lost.any(), "fixture must trip the lost gate"
    pos = np.array([r["position"] for r in recs])
    box = np.max(np.array([r["box"] for r in recs]), axis=None)
    deltas = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    # Every frame-to-frame move INTO and DURING the lost stretch stays
    # under one box size. The exit transition (lost -> re-locked) is
    # exempt: re-acquisition legitimately snaps from the coasted position
    # back to the re-found target in one frame — rate-limiting that snap
    # would only delay convergence. What this test pins is the round-2
    # failure mode: 49-70 px noise-chasing excursions WHILE lost.
    for i in range(len(deltas)):
        if lost[i + 1]:
            assert deltas[i] <= box + 1e-3, (i, deltas[i], box)


def test_conf_ema_not_seeded_while_lost():
    """A start-of-track occlusion must not seed the locked-confidence EMA:
    the -1 sentinel persists until the first non-lost frame (ADVICE r2)."""
    cfg = Config.from_dict({
        "model": {"variant": "vit-t16", "image_size": 64,
                  "dtype": "float32", "use_flash_attention": False},
        "filter": {"num_particles": 128, "lost_conf_threshold": 0.35},
        "tracker": {"mode": "dense"},
    })
    src = open_source("synthetic:moving-square", 8, (192, 192))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    # Blank frames immediately after init: every step is lost.
    blank = np.full_like(frames[0], 120)
    for _ in range(3):
        rec = tr.step(blank)
        assert rec["lost"]
        assert float(np.asarray(tr.state.conf_ema)) == -1.0
    # First clean frame locks and adopts the measured confidence.
    rec = tr.step(frames[1])
    if not rec["lost"]:
        assert float(np.asarray(tr.state.conf_ema)) > 0.0


def test_donate_state_false_keeps_old_state_readable():
    """runtime.donate_state=false must leave the previous step's state
    buffers alive (the knob was a silent no-op before round 3)."""
    cfg = tiny_cfg(runtime={"donate_state": False},
                   io={"num_frames": 4, "frame_size": [128, 128]})
    src = open_source(cfg.io.source, cfg.io.num_frames, tuple(cfg.io.frame_size))
    frames = list(src)
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    old = tr.state
    tr.step(frames[1])
    # With donation this readback raises (buffer deleted); without, it works.
    assert np.isfinite(np.asarray(old.pf.particles)).all()


def test_pooled_appearance_tracks():
    """tracker.appearance='pooled' (the eval-5 scoring mode, now running the
    fused roi_pool_cos_mxu scorer) tracks the flagship synthetic clip: the
    fused cosine path must behave like an appearance model end-to-end, not
    just match pool_from_feat numerically (tests/test_image_ops.py)."""
    cfg = tiny_cfg(tracker={"appearance": "pooled"})
    recs, errs = run_clip(cfg)
    assert np.sqrt(np.mean(np.square(errs))) < 8.0, errs
