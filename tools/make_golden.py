#!/usr/bin/env python
"""Generate committed golden trajectories from the NumPy oracle filter.

SURVEY.md §4.2: "Golden trajectories: committed JSONL of oracle trajectories
per seed x clip; device runs must match within float tolerance (exactly for
the resampling index sequence)." The reference ships no code (SURVEY.md §0),
so the oracle (oracle/numpy_filter.py) IS the semantic spec; this file pins
it in a reviewable artifact that tests/test_golden.py checks the oracle AND
the JAX device filter against.

All randomness comes from numpy's seeded Generator (self-contained — no JAX
involvement), in a fixed draw order that both implementations replay.

Usage: python tools/make_golden.py  (rewrites tests/golden/pf_golden.jsonl)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vitparticlefiltertracker_tpu.oracle import numpy_filter as oracle

CASES = [
    # name, seed, N, steps, ess_threshold, motion kwargs
    dict(name="straight", seed=0, n=256, steps=40, ess=0.5,
         motion=dict(sigma_pos=2.0, sigma_vel=0.5, sigma_scale=0.0, vel_decay=0.95)),
    dict(name="sinusoid", seed=1, n=512, steps=24, ess=0.5,
         motion=dict(sigma_pos=3.0, sigma_vel=0.8, sigma_scale=0.02, vel_decay=0.9)),
    dict(name="always-resample", seed=2, n=128, steps=30, ess=1.1,
         motion=dict(sigma_pos=2.0, sigma_vel=0.5, sigma_scale=0.0, vel_decay=0.95)),
]

LIK_SIGMA = 3.0


def true_position(case_name: str, t: int) -> np.ndarray:
    if case_name == "sinusoid":
        return np.array([50.0 + 1.5 * t, 40.0 + 10.0 * np.sin(2 * np.pi * t / 25.0)])
    return np.array([50.0 + 1.0 * t, 40.0 - 0.5 * t])


def draw_noise(rng: np.random.Generator, n: int):
    """Fixed draw order shared with the test's JAX replay."""
    pos = rng.standard_normal((n, 2))
    vel = rng.standard_normal((n, 2))
    scale = rng.standard_normal((n,))
    u = rng.random()
    return pos, vel, scale, u


def idx_digest(idx: np.ndarray) -> str:
    return hashlib.sha1(",".join(str(int(i)) for i in idx).encode()).hexdigest()[:16]


def run_case(case: dict) -> list[dict]:
    rng = np.random.default_rng(case["seed"])
    n = case["n"]
    params = oracle.OracleParams(ess_threshold=case["ess"], **case["motion"])

    ipos = rng.standard_normal((n, 2))
    ivel = rng.standard_normal((n, 2))
    state = oracle.init_state(
        true_position(case["name"], 0), n, ipos, ivel,
        init_sigma_pos=2.0, init_sigma_vel=0.5,
    )

    records = []
    for t in range(case["steps"]):
        pos_n, vel_n, scale_n, u = draw_noise(rng, n)
        prop = oracle.propagate(state.particles, pos_n, vel_n, scale_n, params)
        tp = true_position(case["name"], t + 1)
        d2 = np.sum((prop[:, :2] - tp[None, :]) ** 2, axis=1)
        loglik = -d2 / (2 * LIK_SIGMA**2)
        state, est = oracle.step(
            state, loglik, pos_n, vel_n, scale_n, u, params
        )
        rec = {
            "case": case["name"],
            "t": t,
            "estimate": [float(x) for x in est],
            "ess": oracle.effective_sample_size(state.log_weights)
            if not state.resampled
            else float(n),
            "resampled": state.resampled,
        }
        if state.resampled:
            rec["idx_digest"] = idx_digest(state.last_indices)
        records.append(rec)
    return records


def main() -> None:
    out_path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                            "pf_golden.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        header = {"format": "vpt-pf-golden-v1", "lik_sigma": LIK_SIGMA,
                  "cases": CASES}
        f.write(json.dumps(header) + "\n")
        for case in CASES:
            for rec in run_case(case):
                f.write(json.dumps(rec) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
