"""Output sink tests (component B13): overlay video writer."""

import json
import os

import numpy as np
import pytest


def test_overlay_sink_writes_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from vitparticlefiltertracker_tpu.io.sink import OverlaySink

    path = str(tmp_path / "overlay.mp4")
    sink = OverlaySink(path, fps=10.0)
    rng = np.random.default_rng(0)
    for i in range(6):
        frame = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        sink.write(
            frame,
            {"position": [48.0 + i, 32.0], "box": [20.0, 16.0], "lost": i == 3},
        )
    sink.close()
    assert os.path.getsize(path) > 0
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 6


def test_cli_overlay_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    from vitparticlefiltertracker_tpu.cli import main

    out = str(tmp_path / "recs.jsonl")
    ov = str(tmp_path / "ov.mp4")
    rc = main(
        [
            "track",
            "--set", "model.variant=vit-t16",
            "--set", "model.image_size=64",
            "--set", "model.dtype=float32",
            "--set", "model.use_flash_attention=false",
            "--set", "filter.num_particles=32",
            "--set", "io.source=synthetic:moving-square",
            "--set", "io.num_frames=4",
            "--set", "io.frame_size=[96, 96]",
            f"--set", f"io.output={out}",
            "--set", f"io.overlay={ov}",
            "--quiet",
        ]
    )
    assert rc == 0
    recs = [json.loads(ln) for ln in open(out)]
    assert len(recs) == 3 and "position" in recs[0]
    assert os.path.getsize(ov) > 0


def test_cli_serve_multistream(tmp_path):
    """`vpt serve`: K sources in, K interleaved JSONL record streams out."""
    from vitparticlefiltertracker_tpu.cli import main

    out = str(tmp_path / "serve.jsonl")
    rc = main(
        [
            "serve",
            "--set", "model.variant=vit-t16",
            "--set", "model.image_size=64",
            "--set", "model.dtype=float32",
            "--set", "model.use_flash_attention=false",
            "--set", "filter.num_particles=32",
            "--set", "runtime.streams=3",
            "--set", "io.source=synthetic:moving-square",
            "--set", "io.num_frames=5",
            "--set", "io.frame_size=[96, 96]",
            f"--set", f"io.output={out}",
            "--quiet",
        ]
    )
    assert rc == 0
    recs = [json.loads(ln) for ln in open(out)]
    assert len(recs) == 3 * 4  # 3 streams x 4 tracked frames
    streams = {r["stream"] for r in recs}
    assert streams == {0, 1, 2}
    # Per-stream frame sequences are complete and ordered.
    for s in streams:
        frames = [r["frame"] for r in recs if r["stream"] == s]
        assert frames == [1, 2, 3, 4]
    # Different seeds per stream => distinct trajectories.
    p0 = [r["position"] for r in recs if r["stream"] == 0]
    p1 = [r["position"] for r in recs if r["stream"] == 1]
    assert p0 != p1


def test_cli_multibank_overlay_draws_all_banks(tmp_path):
    """Round-1 ADVICE: multi-bank track with io.overlay must not produce an
    empty video."""
    pytest.importorskip("cv2")
    from vitparticlefiltertracker_tpu.cli import main

    out = str(tmp_path / "recs.jsonl")
    ov = str(tmp_path / "ov_multi.mp4")
    rc = main(
        [
            "track",
            "--set", "model.variant=vit-t16",
            "--set", "model.image_size=64",
            "--set", "model.dtype=float32",
            "--set", "model.use_flash_attention=false",
            "--set", "filter.num_particles=32",
            "--set", "runtime.banks=2",
            "--set", "io.source=synthetic:multi-2",
            "--set", "io.num_frames=4",
            "--set", "io.frame_size=[96, 96]",
            f"--set", f"io.output={out}",
            "--set", f"io.overlay={ov}",
            "--quiet",
        ]
    )
    assert rc == 0
    assert os.path.getsize(ov) > 0
