"""I/O subsystem + streaming pipeline tests.

Covers SURVEY.md §5.2 (the one concurrent component — decode thread feeding
a bounded queue — gets a stress test), §5.6 (all committed config files must
load), B13 sinks, and the B3 source dispatcher.
"""

import glob
import json
import os
import threading
import time

import numpy as np
import pytest

from vitparticlefiltertracker_tpu.config import load_config
from vitparticlefiltertracker_tpu.io.sink import JsonlSink
from vitparticlefiltertracker_tpu.io.video import open_source
from vitparticlefiltertracker_tpu.runtime.streaming import FramePump, stream_track

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Config files
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))
)
def test_committed_configs_load(path):
    cfg = load_config(path)
    assert cfg.filter.num_particles > 0
    assert cfg.model.dim % cfg.model.heads == 0


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name", ["moving-square", "occlusion", "needle", "surveillance",
             "teleport", "photometric", "rotation", "lookalikes"]
)
def test_synthetic_sources(name):
    src = open_source(f"synthetic:{name}", num_frames=6, frame_size=(120, 160))
    frames = list(src)
    assert len(frames) == 6
    assert frames[0].shape == (120, 160, 3) and frames[0].dtype == np.uint8
    assert src.truth.shape == (6, 2)
    assert src.init_bbox.shape == (4,)


def test_lookalikes_clip_has_distinct_distractors():
    """The lookalikes clip: truth follows the moving-square motion law,
    generation is deterministic, an impostor blob is present away from the
    target, and the occluder bar hides the target box mid-clip."""
    from vitparticlefiltertracker_tpu.io.synthetic import make_clip

    n = 48
    frames, truth, bbox = make_clip("lookalikes", n, 240, 320, seed=0)
    base, base_truth, _ = make_clip("moving-square", n, 240, 320, seed=0)
    tw = bbox[2]
    np.testing.assert_allclose(truth, base_truth, atol=1e-5)
    np.testing.assert_array_equal(frames, make_clip("lookalikes", n, 240, 320, seed=0)[0])
    # Impostor present away from the target on every sampled frame.
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    for t_i in range(0, n, 6):
        far = np.hypot(xx - truth[t_i, 0], yy - truth[t_i, 1]) > 1.1 * tw
        d = np.abs(frames[t_i].astype(int) - base[t_i].astype(int)).max(-1)
        assert ((d > 25) & far).sum() > 0.1 * tw * tw, t_i
    # During the occlusion span the target box is the flat gray bar.
    t_occ = int(n * 0.42) + 2
    cx, cy = truth[t_occ]
    box = frames[t_occ,
                 int(cy - tw / 4): int(cy + tw / 4),
                 int(cx - tw / 4): int(cx + tw / 4)]
    assert np.abs(box.astype(int) - 90).mean() < 6, box.mean(axis=(0, 1))
    # ... and before it, the target pattern is there (bright warm core).
    cx0, cy0 = truth[5]
    core = frames[5, int(cy0 - 2): int(cy0 + 2), int(cx0 - 2): int(cx0 + 2)]
    assert core[..., 0].mean() > 150, core.mean(axis=(0, 1))


def test_photometric_clip_jitters_exposure():
    """The photometric clip's whole-frame brightness must swing frame to
    frame (that's the invariance stressor); truth still marks the target."""
    src = open_source("synthetic:photometric", num_frames=12, frame_size=(128, 128))
    means = np.array([f.mean() for f in src])
    assert means.std() > 4.0, means  # strong global exposure jitter
    # moving-square (same motion, no jitter) is much steadier
    base = open_source("synthetic:moving-square", num_frames=12, frame_size=(128, 128))
    base_means = np.array([f.mean() for f in base])
    assert means.std() > 3 * base_means.std()


def test_multi_clip_targets_pairwise_distinct():
    """All K patterns must differ — the old discrete channel rotation made
    targets i and i+3 pixel-identical, so crossing 'twins' swapped identity
    (no appearance model can resolve identical targets)."""
    from vitparticlefiltertracker_tpu.io.synthetic import make_multi_clip

    frames, truth, bboxes = make_multi_clip(8, num_frames=1, height=720, width=1280)
    crops = []
    for k in range(8):
        x, y, w, h = bboxes[k]
        crops.append(frames[0, int(y) : int(y + h), int(x) : int(x + w)].astype(np.float32))
    for i in range(8):
        for j in range(i + 1, 8):
            diff = np.abs(crops[i] - crops[j]).mean()
            assert diff > 8.0, (i, j, diff)


def test_image_sequence_source(tmp_path):
    import imageio.v3 as iio

    for i in range(4):
        iio.imwrite(
            tmp_path / f"f{i:03d}.png",
            np.full((32, 48, 3), i * 20, np.uint8),
        )
    src = open_source(str(tmp_path / "*.png"))
    frames = list(src)
    assert len(frames) == 4
    assert frames[2][0, 0, 0] == 40  # sorted order preserved


def test_unknown_source_rejected():
    with pytest.raises(ValueError, match="cannot infer source type"):
        open_source("not-a-real-thing.xyz")


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------

def test_jsonl_sink_roundtrip(tmp_path):
    path = str(tmp_path / "out.jsonl")
    with JsonlSink(path) as sink:
        sink.write({"frame": 0, "position": [np.float32(1.5), 2.0],
                    "resampled": np.bool_(True)})
    rec = json.loads(open(path).read())
    assert rec["position"][0] == 1.5 and rec["resampled"] is True


# ---------------------------------------------------------------------------
# FramePump stress (SURVEY.md §5.2): bounded queue under a fast producer and
# a slow, bursty consumer; error propagation; completion.
# ---------------------------------------------------------------------------

def test_frame_pump_order_and_completion():
    frames = [np.full((4, 4, 3), i, np.uint8) for i in range(200)]
    pump = FramePump(iter(frames), depth=3)
    got = [int(f[0, 0, 0]) for f in pump]
    assert got == list(range(200))


def test_frame_pump_backpressure_bounds_memory():
    produced = []

    def gen():
        for i in range(50):
            produced.append(i)
            yield np.full((2, 2, 3), i, np.uint8)

    pump = FramePump(gen(), depth=2)
    time.sleep(0.2)  # producer must stall at the bound, not run ahead
    assert len(produced) <= 4  # depth + in-flight put + one being generated
    list(pump)
    assert len(produced) == 50


def test_frame_pump_error_propagates():
    def gen():
        yield np.zeros((2, 2, 3), np.uint8)
        raise RuntimeError("decode failed")

    pump = FramePump(gen(), depth=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(pump)


def test_frame_pump_concurrent_consumers_race():
    """Multiple consumers draining one pump must partition the stream exactly
    (queue semantics — no duplicates, no losses) and NO consumer may die.
    Round-1 ADVICE: the old generator-based iterator raised 'generator
    already executing' in one thread and the test still passed because the
    survivor drained everything — consumer crashes are now captured and
    asserted against."""
    n = 300
    pump = FramePump((np.full((2, 2, 3), i % 251, np.uint8) for i in range(n)), depth=4)
    it = iter(pump)
    seen = []
    crashes = []
    lock = threading.Lock()

    def consume():
        try:
            while True:
                try:
                    f = next(it)
                except StopIteration:
                    return
                with lock:
                    seen.append(int(f[0, 0, 0]))
        except BaseException as e:  # noqa: BLE001 — the point is to catch all
            with lock:
                crashes.append(e)

    threads = [threading.Thread(target=consume) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "consumer wedged"
    assert crashes == [], f"consumer thread(s) crashed: {crashes}"
    want = [i % 251 for i in range(n)]
    assert sorted(seen) == sorted(want)


def test_frame_pump_error_propagates_once_to_concurrent_consumers():
    """A producer error must surface in exactly ONE consumer; the rest see
    clean StopIteration (otherwise multi-consumer error handling double-fires)."""
    def gen():
        yield np.zeros((2, 2, 3), np.uint8)
        raise RuntimeError("decode failed")

    pump = FramePump(gen(), depth=2)
    it = iter(pump)
    errors = []
    lock = threading.Lock()

    def consume():
        try:
            for _ in it:
                pass
        except RuntimeError as e:
            with lock:
                errors.append(e)

    threads = [threading.Thread(target=consume) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(errors) == 1 and "decode failed" in str(errors[0])


# ---------------------------------------------------------------------------
# stream_track end-to-end on the tiny tracker
# ---------------------------------------------------------------------------

def test_stream_track_end_to_end():
    from vitparticlefiltertracker_tpu.config import Config
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker

    cfg = Config.from_dict(
        {
            "model": {"variant": "vit-t16", "image_size": 64, "dtype": "float32",
                      "use_flash_attention": False},
            "filter": {"num_particles": 64},
            "tracker": {"mode": "dense"},
        }
    )
    src = open_source("synthetic:moving-square", num_frames=10, frame_size=(128, 128))
    tracker = Tracker(cfg)
    recs = []
    stats = stream_track(
        tracker, src, src.init_bbox, on_record=recs.append, readback_window=3
    )
    assert stats["frames"] == 9
    assert [r["frame"] for r in recs] == list(range(1, 10))  # ordered, complete
    assert all(np.isfinite(r["position"]).all() for r in recs)


def test_video_file_roundtrip(tmp_path):
    """B3 core contract: a real encoded video file decodes into the tracker
    path (reference README.md:42 'video feed')."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    # Smooth gradients survive lossy encoding (noise wouldn't).
    yy, xx = np.mgrid[0:48, 0:64]
    frames = [
        np.stack([(xx * 4 + i * 30) % 256, (yy * 5) % 256,
                  np.full_like(xx, 60 + i * 10)], axis=-1).astype(np.uint8)
        for i in range(5)
    ]
    for f in frames:
        w.write(f[..., ::-1])  # writer takes BGR
    w.release()

    src = open_source(path)
    got = list(src)
    assert len(got) == 5
    assert got[0].shape == (48, 64, 3) and got[0].dtype == np.uint8
    # Lossy codec: content should still correlate strongly frame-by-frame.
    for a, b in zip(got, frames):
        err = np.abs(a.astype(np.int32) - b.astype(np.int32)).mean()
        assert err < 20.0, err


def test_long_run_stability():
    """200 frames without NaNs, divergence, or state blowup (soak test)."""
    from vitparticlefiltertracker_tpu.config import Config
    from vitparticlefiltertracker_tpu.runtime.tracker import Tracker
    import jax
    import jax.numpy as jnp

    cfg = Config.from_dict(
        {
            "model": {"variant": "vit-t16", "image_size": 64, "dtype": "float32",
                      "use_flash_attention": False},
            "filter": {"num_particles": 64},
            "tracker": {"mode": "dense"},
        }
    )
    src = open_source("synthetic:moving-square", 201, (128, 128))
    frames = np.stack(list(src))
    tr = Tracker(cfg)
    tr.init(frames[0], src.init_bbox)
    outs = tr.track_clip_device(jax.device_put(jnp.asarray(frames[1:])))
    pos = np.asarray(outs.position)
    assert np.isfinite(pos).all()
    err = np.linalg.norm(pos - src.truth[1:], axis=1)
    # Tiny config = 4x4 feature grid (64px model), so structured cells are
    # heavily overlapping and precision at the edge-parked extreme is
    # ~box-size; the soak asserts NO runaway/NaN, not flagship accuracy.
    assert err[-20:].mean() < 20.0, err[-20:]
    assert err.max() < 50.0, err.max()
    assert np.isfinite(np.asarray(tr.state.pf.log_weights)).all()
