"""Native (C++) frame-ingestion runtime tests (native/vpt_io.cpp via ctypes).

Gated on the shared library building in this environment; the library is the
host half of the fused decode->track pipeline (B12) — a GIL-free producer
thread filling a bounded prefetch ring.
"""

import numpy as np
import pytest

from vitparticlefiltertracker_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_synthetic_stream_order_and_shape():
    src = native.NativeSyntheticSource(12, 120, 160, seed=7)
    frames = list(src)
    assert len(frames) == 12
    assert frames[0].shape == (120, 160, 3) and frames[0].dtype == np.uint8
    # Frames differ over time (the target moves).
    assert not np.array_equal(frames[0], frames[-1])
    src.close()


def test_synthetic_stream_matches_random_access():
    src = native.NativeSyntheticSource(8, 96, 128, seed=3)
    direct = [src.read(i) for i in range(8)]
    streamed = list(src)
    for a, b in zip(direct, streamed):
        np.testing.assert_array_equal(a, b)
    src.close()


def test_synthetic_truth_and_bbox():
    src = native.NativeSyntheticSource(10, 224, 224, seed=0)
    truth = src.truth
    assert truth.shape == (10, 2)
    # Target moves right at ~2px/frame (io/synthetic.py motion model).
    assert truth[-1, 0] > truth[0, 0]
    bbox = src.init_bbox
    np.testing.assert_allclose(bbox[:2] + bbox[2:] / 2, truth[0], atol=0.51)
    # The painted target actually sits at the ground-truth location.
    f0 = src.read(0)
    cx, cy = int(truth[0, 0]), int(truth[0, 1])
    center_px = f0[cy, cx].astype(np.int32)
    corner_px = f0[5, 5].astype(np.int32)
    assert center_px[0] > 200  # bright warm core (R=40+215)
    assert abs(int(center_px[0]) - int(corner_px[0])) > 30
    src.close()


def test_raw_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, size=(5, 64, 48, 3), dtype=np.uint8)
    path = str(tmp_path / "clip.rgb24")
    with open(path, "wb") as f:
        f.write(clip.tobytes())
    src = native.NativeRawSource(path, 64, 48)
    assert len(src) == 5
    got = list(src)
    for i in range(5):
        np.testing.assert_array_equal(got[i], clip[i])
    src.close()


def test_raw_truncates_to_num_frames(tmp_path):
    clip = np.zeros((6, 8, 8, 3), np.uint8)
    path = str(tmp_path / "c.rgb24")
    with open(path, "wb") as f:
        f.write(clip.tobytes())
    src = native.NativeRawSource(path, 8, 8, num_frames=4)
    assert len(src) == 4
    assert len(list(src)) == 4
    src.close()


def test_open_source_dispatches_native(tmp_path):
    from vitparticlefiltertracker_tpu.io.video import open_source

    src = open_source("native-synthetic:moving-square", 5, (64, 64), seed=1)
    assert len(list(src)) == 5

    clip = np.zeros((3, 32, 32, 3), np.uint8)
    path = str(tmp_path / "x.rgb24")
    with open(path, "wb") as f:
        f.write(clip.tobytes())
    src2 = open_source(path, 0, (32, 32))
    assert len(list(src2)) == 3


def test_stream_early_exit_releases_and_reiter_raises():
    """Abandoning the stream mid-way must not wedge the producer, and a
    second iteration fails loudly instead of silently resuming."""
    src = native.NativeSyntheticSource(50, 32, 32, seed=0, depth=2)
    it = iter(src)
    for _ in range(3):
        next(it)
    it.close()  # generator close -> held slot released
    with pytest.raises(RuntimeError, match="already consumed"):
        next(iter(src))
    src.close()


def test_rgb24_python_memmap_fallback(tmp_path):
    from vitparticlefiltertracker_tpu.io.video import RawMemmapSource

    clip = np.arange(4 * 8 * 8 * 3, dtype=np.uint8).reshape(4, 8, 8, 3)
    path = str(tmp_path / "c.rgb24")
    with open(path, "wb") as f:
        f.write(clip.tobytes())
    src = RawMemmapSource(path, 8, 8, num_frames=3)
    got = list(src)
    assert len(got) == 3
    np.testing.assert_array_equal(got[1], clip[1])


def test_stream_backpressure_bounded():
    """Consumer that never releases more than ring depth must not see the
    producer run ahead (slots are reused in order)."""
    src = native.NativeSyntheticSource(100, 32, 32, seed=0, depth=2)
    it = iter(src)
    first = next(it)
    rest = list(it)
    assert len(rest) == 99
    assert first.shape == (32, 32, 3)
    src.close()


def test_read_rect_matches_frame_slice_synthetic():
    src = native.NativeSyntheticSource(10, 200, 260, seed=5)
    for idx, (x0, y0, w, h, s) in [
        (0, (0, 0, 260, 200, 1)),       # whole frame
        (3, (40, 30, 120, 96, 1)),      # interior rect
        (3, (40, 30, 120, 96, 4)),      # strided interior rect
        (7, (0, 0, 260, 200, 8)),       # decimated whole frame
        (9, (257, 197, 3, 3, 1)),       # bottom-right corner
    ]:
        full = src.read(idx)
        got = src.read_rect(idx, x0, y0, w, h, s)
        np.testing.assert_array_equal(got, full[y0 : y0 + h : s, x0 : x0 + w : s])
    src.close()


def test_read_rect_matches_frame_slice_raw(tmp_path):
    rng = np.random.default_rng(1)
    clip = rng.integers(0, 255, size=(4, 60, 80, 3), dtype=np.uint8)
    path = str(tmp_path / "clip.rgb24")
    with open(path, "wb") as f:
        f.write(clip.tobytes())
    src = native.NativeRawSource(path, 60, 80)
    got = src.read_rect(2, 10, 8, 48, 40, 3)
    np.testing.assert_array_equal(got, clip[2, 8 : 8 + 40 : 3, 10 : 10 + 48 : 3])
    src.close()


def test_read_rect_rejects_out_of_range():
    src = native.NativeSyntheticSource(4, 50, 50, seed=0)
    with pytest.raises(ValueError):
        src.read_rect(0, 40, 40, 20, 20, 1)  # spills past the frame edge
    with pytest.raises(ValueError):
        src.read_rect(99, 0, 0, 10, 10, 1)  # bad frame index
    src.close()


def test_read_view_matches_numpy_bilinear():
    src = native.NativeSyntheticSource(6, 180, 240, seed=9)
    idx, ox, oy, stride, out = 3, 20.5, 14.25, 2.75, 48
    got = src.read_view(idx, ox, oy, stride, out).astype(np.float64)
    frame = src.read(idx).astype(np.float64)
    fy = np.clip(oy + np.arange(out) * stride, 0, 179)
    fx = np.clip(ox + np.arange(out) * stride, 0, 239)
    y0 = fy.astype(int); y1 = np.minimum(y0 + 1, 179); wy = fy - y0
    x0 = fx.astype(int); x1 = np.minimum(x0 + 1, 239); wx = fx - x0
    want = (
        (1 - wy)[:, None, None] * ((1 - wx)[None, :, None] * frame[y0][:, x0]
                                   + wx[None, :, None] * frame[y0][:, x1])
        + wy[:, None, None] * ((1 - wx)[None, :, None] * frame[y1][:, x0]
                               + wx[None, :, None] * frame[y1][:, x1])
    )
    np.testing.assert_allclose(got, np.floor(want + 0.5), atol=1.0)
    src.close()


def test_read_view_stride1_is_identity():
    src = native.NativeSyntheticSource(4, 100, 120, seed=2)
    got = src.read_view(1, 10.0, 20.0, 1.0, 32)
    np.testing.assert_array_equal(got, src.read(1)[20:52, 10:42])
    src.close()
