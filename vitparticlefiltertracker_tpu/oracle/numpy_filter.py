"""NumPy oracle for the SIR particle filter (component B15, SURVEY.md §4.2).

The reference repo contains no code (SURVEY.md §0) — its README only states
that a particle filter performs "accurate state estimation and object
tracking" (/root/reference/README.md:8). This oracle *defines* the exact
semantics of our filter: Gaussian constant-velocity motion propagation,
log-weight accumulation, weighted-mean estimation, and textbook systematic
resampling written as the O(N) inverse-CDF scalar loop.

All randomness is an explicit input (noise arrays, a single uniform for the
resampler), so the JAX device filter can be driven by the *same* draws and
compared bitwise on resampling indices / within float tolerance on states.

Particle state layout (column order shared with the JAX core):
    [x, y, vx, vy, log_s]   (px, px, px/frame, px/frame, log scale factor)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

STATE_DIM = 5


@dataclass
class OracleParams:
    sigma_pos: float = 4.0
    sigma_vel: float = 1.0
    sigma_scale: float = 0.0
    vel_decay: float = 0.95
    ess_threshold: float = 0.5  # resample when ESS < threshold * N


@dataclass
class OracleState:
    particles: np.ndarray  # [N, 5] float
    log_weights: np.ndarray  # [N] normalized: logsumexp == 0
    resampled: bool = False
    last_indices: np.ndarray | None = None


def init_state(
    center: np.ndarray,
    num_particles: int,
    pos_noise: np.ndarray,
    vel_noise: np.ndarray,
    init_sigma_pos: float,
    init_sigma_vel: float,
) -> OracleState:
    """Particle cloud around the initial bbox center.

    pos_noise, vel_noise: [N, 2] standard-normal draws (provided by caller).
    """
    n = num_particles
    p = np.zeros((n, STATE_DIM), dtype=np.float64)
    p[:, 0:2] = center[None, :] + init_sigma_pos * pos_noise
    p[:, 2:4] = init_sigma_vel * vel_noise
    logw = np.full((n,), -np.log(n), dtype=np.float64)
    return OracleState(particles=p, log_weights=logw)


def propagate(
    particles: np.ndarray,
    pos_noise: np.ndarray,
    vel_noise: np.ndarray,
    scale_noise: np.ndarray,
    params: OracleParams,
) -> np.ndarray:
    """Gaussian constant-velocity motion model (BASELINE.json:5).

    x' = x + v + sigma_pos * eps_pos
    v' = vel_decay * v + sigma_vel * eps_vel
    log_s' = log_s + sigma_scale * eps_s
    """
    out = particles.copy()
    out[:, 0:2] = particles[:, 0:2] + particles[:, 2:4] + params.sigma_pos * pos_noise
    out[:, 2:4] = params.vel_decay * particles[:, 2:4] + params.sigma_vel * vel_noise
    out[:, 4] = particles[:, 4] + params.sigma_scale * scale_noise
    return out


def normalize_log_weights(log_weights: np.ndarray) -> np.ndarray:
    m = np.max(log_weights)
    lse = m + np.log(np.sum(np.exp(log_weights - m)))
    return log_weights - lse


def effective_sample_size(log_weights: np.ndarray) -> float:
    w = np.exp(normalize_log_weights(log_weights))
    return float(1.0 / np.sum(w * w))


def systematic_resample_indices(weights: np.ndarray, u: float) -> np.ndarray:
    """Textbook O(N) systematic resampler (inverse-CDF scalar loop).

    weights: normalized probabilities summing to ~1. u: single U[0,1) draw.
    Returns ancestor indices idx[i] = min{ j : cumsum(w)[j] >= (u+i)/N }.
    The device implementation lowers this to cumsum + searchsorted
    (BASELINE.json:5); this loop is the semantics it must match exactly.
    """
    n = len(weights)
    positions = (u + np.arange(n, dtype=np.float64)) / n
    cumsum = np.cumsum(weights)
    cumsum[-1] = max(cumsum[-1], 1.0)  # guard against float undersum
    indices = np.zeros(n, dtype=np.int64)
    j = 0
    for i in range(n):
        while cumsum[j] < positions[i]:
            j += 1
        indices[i] = j
    return indices


def estimate_state(particles: np.ndarray, log_weights: np.ndarray) -> np.ndarray:
    """Posterior weighted-mean state -> per-frame position output."""
    w = np.exp(normalize_log_weights(log_weights))
    return (w[:, None] * particles).sum(axis=0)


def step(
    state: OracleState,
    log_likelihood: np.ndarray,
    pos_noise: np.ndarray,
    vel_noise: np.ndarray,
    scale_noise: np.ndarray,
    resample_u: float,
    params: OracleParams,
) -> tuple[OracleState, np.ndarray]:
    """One full SIR step: propagate -> weight -> estimate -> maybe-resample.

    Mirrors the jitted device step's op order (SURVEY.md §3.2(a)); the
    estimate is computed from the post-weight, pre-resample posterior.
    """
    n = state.particles.shape[0]
    particles = propagate(state.particles, pos_noise, vel_noise, scale_noise, params)
    log_w = normalize_log_weights(state.log_weights + log_likelihood)
    est = estimate_state(particles, log_w)

    ess = effective_sample_size(log_w)
    do_resample = ess < params.ess_threshold * n
    if do_resample:
        w = np.exp(log_w)
        w = w / w.sum()
        idx = systematic_resample_indices(w, resample_u)
        particles = particles[idx]
        log_w = np.full((n,), -np.log(n), dtype=np.float64)
    else:
        idx = None

    return (
        OracleState(
            particles=particles,
            log_weights=log_w,
            resampled=bool(do_resample),
            last_indices=idx,
        ),
        est,
    )
