"""CLI-level checkpoint/resume (`io.save_state` / `io.resume_state`,
SURVEY.md §5.4): a `vpt track` run interrupted mid-clip and resumed in a
SECOND process-level invocation produces the same trajectory as the
uninterrupted run (counter-based RNG -> bitwise-continuing; the API-level
guarantee is tests/test_checkpoint.py, this pins the CLI plumbing)."""

import json

import numpy as np
import pytest

from vitparticlefiltertracker_tpu.io.video import open_source


BASE = [
    "track",
    "--set", "model.variant=vit-t16",
    "--set", "model.image_size=64",
    "--set", "model.dtype=float32",
    "--set", "model.use_flash_attention=false",
    "--set", "filter.num_particles=64",
    "--quiet",
]


def _write_pngs(frames, d):
    cv2 = pytest.importorskip("cv2")
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"f{i:03d}.png"), f[..., ::-1])


def test_cli_track_save_resume_matches_uninterrupted(tmp_path):
    from vitparticlefiltertracker_tpu.cli import main

    n = 13
    src = open_source("synthetic:moving-square", n, (96, 96), seed=0)
    frames = list(src)
    all_d = tmp_path / "all"
    tail_d = tmp_path / "tail"
    all_d.mkdir(), tail_d.mkdir()
    _write_pngs(frames, all_d)
    _write_pngs(frames[7:], tail_d)  # continuation: frames 7..12
    bbox = "[{},{},{},{}]".format(*np.asarray(src.init_bbox).tolist())

    # Uninterrupted reference over the full glob.
    full_out = str(tmp_path / "full.jsonl")
    rc = main(BASE + [
        "--set", f"io.source={all_d}/*.png",
        "--set", f"io.init_bbox={bbox}",
        "--set", f"io.output={full_out}",
    ])
    assert rc == 0
    full = [json.loads(ln) for ln in open(full_out)]
    assert len(full) == n - 1

    # First half (frames 1..6 tracked), state saved.
    state = str(tmp_path / "state.npz")
    half_out = str(tmp_path / "half.jsonl")
    rc = main(BASE + [
        "--set", f"io.source={all_d}/*.png",
        "--set", "io.num_frames=7",
        "--set", f"io.init_bbox={bbox}",
        "--set", f"io.output={half_out}",
        "--set", f"io.save_state={state}",
    ])
    assert rc == 0
    half = [json.loads(ln) for ln in open(half_out)]
    assert [r["frame"] for r in half] == list(range(1, 7))

    # Second invocation: resume + the tail frames only.
    rest_out = str(tmp_path / "rest.jsonl")
    rc = main(BASE + [
        "--set", f"io.source={tail_d}/*.png",
        "--set", f"io.resume_state={state}",
        "--set", f"io.output={rest_out}",
    ])
    assert rc == 0
    rest = [json.loads(ln) for ln in open(rest_out)]
    # Record numbering continues from the checkpointed frame counter.
    assert [r["frame"] for r in rest] == list(range(7, n))

    stitched = half + rest
    for a, b in zip(full, stitched):
        assert a["frame"] == b["frame"]
        np.testing.assert_allclose(a["position"], b["position"], atol=1e-4)
        assert a["resampled"] == b["resampled"]


def test_cli_resume_rejects_banks(tmp_path):
    from vitparticlefiltertracker_tpu.cli import main

    with pytest.raises(ValueError, match="resume_state"):
        main(BASE + [
            "--set", "runtime.banks=2",
            "--set", "io.resume_state=/nonexistent.npz",
            "--set", "io.num_frames=2",
        ])
