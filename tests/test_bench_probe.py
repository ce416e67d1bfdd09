"""Forced-blip coverage for bench.py's retry-hardened device probe.

Round-4 VERDICT weak #1: the driver's headline artifact became a 2.25 fps
CPU-fallback row because ONE 150 s probe lost a race with relay
cold-connect (>120 s observed on a healthy chip). The fix is a retry loop;
these tests script the probe via the VPT_PROBE_CMD hook to prove:
  1. blip (first attempt fails, second succeeds) -> reachable True,
  2. dead relay (all attempts fail) -> reachable False (CPU fallback),
  3. healthy (first attempt succeeds) -> no retries burned.
"""

import os

import pytest

import bench


@pytest.fixture()
def probe_env(tmp_path, monkeypatch):
    """Scripted probe: fails until `threshold` prior attempts were recorded."""
    counter = tmp_path / "attempts"
    counter.write_text("")

    def script(threshold: int) -> str:
        # Each invocation appends one byte; succeed once the file already
        # holds `threshold` bytes (i.e., from attempt threshold+1 onward).
        return (
            f"c=$(wc -c < {counter}); printf x >> {counter}; "
            f"[ $c -ge {threshold} ]"
        )

    monkeypatch.setenv("VPT_PROBE_TIMEOUT_S", "5")
    monkeypatch.setenv("VPT_PROBE_ATTEMPTS", "3")

    def arm(threshold: int) -> None:
        counter.write_text("")
        monkeypatch.setenv("VPT_PROBE_CMD", script(threshold))

    yield arm, counter


def test_probe_blip_recovers(probe_env):
    arm, counter = probe_env
    arm(threshold=1)  # first attempt fails, second succeeds
    assert bench._device_reachable(backoff_s=0.01) is True
    assert len(counter.read_bytes()) == 2


def test_probe_dead_relay_falls_back(probe_env):
    arm, counter = probe_env
    arm(threshold=99)  # never succeeds within 3 attempts
    assert bench._device_reachable(backoff_s=0.01) is False
    assert len(counter.read_bytes()) == 3


def test_probe_healthy_no_retries(probe_env):
    arm, counter = probe_env
    arm(threshold=0)  # immediate success
    assert bench._device_reachable(backoff_s=0.01) is True
    assert len(counter.read_bytes()) == 1


def test_probe_timeout_counts_as_failure(tmp_path, monkeypatch):
    monkeypatch.setenv("VPT_PROBE_CMD", "sleep 30")
    monkeypatch.setenv("VPT_PROBE_TIMEOUT_S", "0.2")
    monkeypatch.setenv("VPT_PROBE_ATTEMPTS", "2")
    assert bench._device_reachable(backoff_s=0.01) is False
