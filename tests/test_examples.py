"""The examples/ directory stays runnable (reference README.md:10
"Modular Design: Easy to extend and integrate" — the examples ARE the
integration contract), and the package root exposes the documented lazy
API (docs/API.md)."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run_example(name: str) -> str:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_minimal_track_example():
    stdout = _run_example("minimal_track.py")
    lines = [ln for ln in stdout.splitlines() if ln.startswith("frame ")]
    assert len(lines) == 15  # 16 frames, first consumed by init
    assert "pos=(" in lines[-1]


def test_custom_source_streaming_example():
    stdout = _run_example("custom_source_streaming.py")
    assert "39 frames" in stdout and "last position" in stdout


def test_lazy_package_exports():
    import vitparticlefiltertracker_tpu as vpt

    # Documented names resolve (docs/API.md); unknown names raise.
    assert vpt.Tracker.__name__ == "Tracker"
    assert vpt.MultiTracker.__name__ == "MultiTracker"
    assert vpt.MultiStreamTracker.__name__ == "MultiStreamTracker"
    assert callable(vpt.stream_track) and callable(vpt.open_source)
    try:
        vpt.not_a_thing
    except AttributeError as e:
        assert "not_a_thing" in str(e)
    else:
        raise AssertionError("unknown attribute must raise AttributeError")
