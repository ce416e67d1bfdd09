"""Chunked ROI streaming (component B12): C frames per H2D + dispatch.

The streaming pipeline's throughput cap on relay-attached devices is the
per-dispatch submission cost, so stream_track(chunk=C) tracks C frames per
jitted call (Tracker.step_chunk_device = lax.scan of the per-frame step
over stacked ROI views). These tests pin (a) exact equivalence of the
chunked scan to C sequential step() calls — same RNG counters, bitwise
outputs — and (b) the end-to-end chunked pipeline: every frame tracked,
records contiguous and in order, trajectory follows the target.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitparticlefiltertracker_tpu.config import Config
from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.ops.image import FrameView, StreamFrame
from vitparticlefiltertracker_tpu.runtime.streaming import stream_track
from vitparticlefiltertracker_tpu.runtime.tracker import (
    Tracker,
    build_tracker_fns,
)


def _cfg(particles=256):
    return Config.from_dict(
        {
            "model": {
                "variant": "vit-t16",
                "image_size": 128,
                "dtype": "float32",
                "use_flash_attention": False,
            },
            "filter": {"num_particles": particles, "motion": {"sigma_pos": 3.0}},
            "tracker": {"mode": "dense"},
            "io": {"frame_size": [240, 320]},
        }
    )


def _stream_frames(arr, centers, roi=144, gs=4):
    """Build per-frame StreamFrames: stride-1 ROI crops around `centers`
    plus one shared decimated global view (as the RoiShipper would)."""
    h, w = arr.shape[1:3]
    glob = FrameView(
        pixels=jnp.asarray(arr[0][::gs, ::gs].astype(np.float32)),
        origin=jnp.zeros(2, jnp.float32),
        stride=float(gs),
    )
    sfs = []
    for frame, c in zip(arr, centers):
        ox = int(np.clip(round(c[0] - roi / 2), 0, w - roi))
        oy = int(np.clip(round(c[1] - roi / 2), 0, h - roi))
        sfs.append(
            StreamFrame(
                track=FrameView(
                    pixels=jnp.asarray(
                        frame[oy : oy + roi, ox : ox + roi].astype(np.float32)
                    ),
                    origin=jnp.asarray([ox, oy], jnp.float32),
                    stride=1.0,
                ),
                glob=glob,
            )
        )
    return sfs


def test_track_chunk_equals_sequential_steps():
    """fns.track_chunk == C sequential fns.step calls: same RNG counters and
    resampling decisions, numerics within scan-vs-loop fusion tolerance
    (same bar as test_tracker_e2e.py::test_track_clip_matches_sequential_steps
    — XLA fuses the scan body differently from the standalone step, so
    float results differ in the last ulps, not semantics)."""
    cfg = _cfg().resolve()
    fns = build_tracker_fns(cfg)
    src = open_source("synthetic:moving-square", 5, (240, 320), seed=3)
    arr = np.stack(list(src))
    from vitparticlefiltertracker_tpu.models.params import resolve_vit_params

    prm = resolve_vit_params(cfg, None)
    state0 = jax.jit(fns.init)(
        prm, jnp.asarray(arr[0]), jnp.asarray(src.init_bbox), jnp.int32(0)
    )
    sfs = _stream_frames(arr[1:], src.truth[1:])

    # Sequential per-frame steps.
    step = jax.jit(fns.step)
    st = state0
    outs_seq = []
    for sf in sfs:
        st, out = step(prm, st, sf)
        outs_seq.append(out)

    # One chunked dispatch over the same stacked views.
    chunk = StreamFrame(
        track=FrameView(
            pixels=jnp.stack([sf.track.pixels for sf in sfs]),
            origin=jnp.stack([sf.track.origin for sf in sfs]),
            stride=1.0,
        ),
        glob=sfs[0].glob,
    )
    st_c, outs_c = jax.jit(fns.track_chunk)(prm, state0, chunk)

    # RNG counters advance identically -> bitwise-equal key + frame counter.
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(st.key)),
        np.asarray(jax.random.key_data(st_c.key)),
    )
    np.testing.assert_array_equal(
        np.asarray(st.frame_idx), np.asarray(st_c.frame_idx)
    )
    pos_c = np.asarray(outs_c.position)
    ess_c = np.asarray(outs_c.ess)
    for i, out in enumerate(outs_seq):
        np.testing.assert_allclose(
            np.asarray(out.position), pos_c[i], atol=1e-3, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(out.ess), ess_c[i], atol=0.1)
        assert bool(out.resampled) == bool(outs_c.resampled[i])
        assert bool(out.lost) == bool(outs_c.lost[i])
    np.testing.assert_allclose(
        np.asarray(st.pf.particles),
        np.asarray(st_c.pf.particles),
        atol=1e-2,
        rtol=1e-4,
    )


def test_stream_track_chunked_e2e():
    """Chunked pipeline tracks every frame (incl. a sub-chunk tail) with
    contiguous in-order records and a trajectory that follows the target."""
    cfg = _cfg()
    src = open_source("synthetic:moving-square", 24, (240, 320), seed=0)
    arr = np.stack(list(src))
    tr = Tracker(cfg)
    recs = []
    stats = stream_track(
        tr,
        iter(arr[1:]),
        src.init_bbox,
        on_record=recs.append,
        roi_px=160,
        glob_stride=4,
        glob_every=4,
        # Tight lag: on a cold compile cache the first chunk's compile
        # stalls steering while submissions race ahead on zero velocity —
        # an 8-frame cap bounds that drift regardless of machine load.
        steer_lag=8,
        chunk=4,
        readback_window=8,
    )
    # arr[1:] has 23 frames; the first is consumed as the init frame ->
    # 22 tracked: 5 chunks of 4 + a 2-frame tail through the per-frame path.
    assert stats["frames"] == 22
    assert sorted(r["frame"] for r in recs) == list(range(1, 23))
    truth = src.truth[2:]  # records index from the frame after init
    errs = [
        float(np.hypot(*(np.asarray(r["position"]) - truth[r["frame"] - 1])))
        for r in sorted(recs, key=lambda r: r["frame"])
    ]
    # Bound matches test_streaming_roi's e2e bar: steering is asynchronous,
    # so per-frame errors vary with thread timing/compile warmth; exact
    # numerics are pinned by the deterministic equivalence test above.
    assert np.sqrt(np.mean(np.square(errs))) < 12.0, errs


def test_stream_track_chunk_requires_roi():
    tr = Tracker(_cfg())
    try:
        stream_track(tr, iter([np.zeros((240, 320, 3), np.uint8)]),
                     [100, 100, 40, 40], chunk=4)
    except ValueError as e:
        assert "chunk" in str(e)
    else:
        raise AssertionError("chunk>1 without roi_px must raise")


def test_step_packed_matches_step_device():
    """Tracker.step_packed / step_chunk_packed fuse the record packing into
    the step executable (one dispatch per chunk on relay-attached devices).
    Contract: the packed row unpacks with OutputPacker to the SAME TrackOutput
    the unfused path produces, and the state advances identically."""
    from vitparticlefiltertracker_tpu.runtime.streaming import OutputPacker

    cfg = _cfg()
    src = open_source("synthetic:moving-square", 12, (240, 320), seed=1)
    arr = np.stack(list(src))
    sfs = _stream_frames(arr[1:], src.truth[1:])

    tr_a, tr_b = Tracker(cfg), Tracker(cfg)
    tr_a.init(arr[0], src.init_bbox)
    tr_b.init(arr[0], src.init_bbox)

    # Per-frame: unfused (step + OutputPacker.pack) vs fused step_packed.
    out0 = tr_a.step_device(sfs[0])
    packer = OutputPacker(out0)
    row_a = np.asarray(packer.pack(out0))
    row_b = np.asarray(tr_b.step_packed(sfs[0]))
    np.testing.assert_allclose(row_a, row_b, atol=1e-5, rtol=1e-6)

    # Unpacked record round-trips to the original TrackOutput fields.
    rec = packer.unpack(row_b)
    np.testing.assert_allclose(
        np.asarray(out0.position), np.asarray(rec.position), atol=1e-5
    )
    assert bool(rec.lost) == bool(out0.lost)

    # Chunked: both trackers advance through the same 4-frame chunk.
    chunk = StreamFrame(
        track=FrameView(
            pixels=jnp.stack([sf.track.pixels for sf in sfs[1:5]]),
            origin=jnp.stack([sf.track.origin for sf in sfs[1:5]]),
            stride=1.0,
        ),
        glob=sfs[0].glob,
    )
    outs = tr_a.step_chunk_device(chunk)
    cpack = OutputPacker(outs)
    row_a = np.asarray(cpack.pack(outs))
    row_b = np.asarray(tr_b.step_chunk_packed(chunk))
    np.testing.assert_allclose(row_a, row_b, atol=1e-5, rtol=1e-6)
    # States stay in lockstep after mixed fused/unfused stepping.
    np.testing.assert_array_equal(
        np.asarray(tr_a.state.frame_idx), np.asarray(tr_b.state.frame_idx)
    )
    np.testing.assert_allclose(
        np.asarray(tr_a.state.pf.particles),
        np.asarray(tr_b.state.pf.particles),
        atol=1e-3, rtol=1e-5,
    )


def test_stream_track_adaptive_chunk_switches_and_tracks():
    """chunk_max > chunk with an unreachable fps_target forces a switch to
    the larger dispatch size mid-stream: every frame must still be tracked
    once, records stay contiguous/in-order across the switch (mixed-shape
    packed rows), and the trajectory still follows the target."""
    cfg = _cfg()
    src = open_source("synthetic:moving-square", 44, (240, 320), seed=0)
    arr = np.stack(list(src))
    tr = Tracker(cfg)
    recs = []
    stats = stream_track(
        tr,
        iter(arr[1:]),
        src.init_bbox,
        on_record=recs.append,
        roi_px=160,
        glob_stride=4,
        glob_every=4,
        steer_lag=8,
        chunk=2,
        chunk_max=4,
        fps_target=1e9,  # never reachable -> switch up as soon as allowed
        readback_window=8,
    )
    assert stats["frames"] == 42
    assert sorted(r["frame"] for r in recs) == list(range(1, 43))
    truth = src.truth[2:]
    errs = [
        float(np.hypot(*(np.asarray(r["position"]) - truth[r["frame"] - 1])))
        for r in sorted(recs, key=lambda r: r["frame"])
    ]
    assert np.sqrt(np.mean(np.square(errs))) < 12.0, errs


def test_roi_shipper_lost_seen():
    from vitparticlefiltertracker_tpu.runtime.streaming import RoiShipper

    ship = RoiShipper((240, 320), 160, (160.0, 120.0))
    assert not ship.lost_seen
    ship.observe({"frame": 3, "position": [10.0, 10.0], "lost": True})
    assert ship.lost_seen
    # Stale records (older frame) must not clear the flag.
    ship.observe({"frame": 2, "position": [0.0, 0.0], "lost": False})
    assert ship.lost_seen
    ship.observe({"frame": 4, "position": [11.0, 10.0], "lost": False})
    assert not ship.lost_seen
