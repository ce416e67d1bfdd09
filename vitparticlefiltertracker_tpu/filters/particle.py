"""JAX particle filter core (component B7, SURVEY.md §2.2).

Implements the reference's "Particle Filter: probabilistic algorithms for
accurate state estimation and object tracking" (/root/reference/README.md:8)
as pure, jittable JAX: Gaussian constant-velocity propagation, log-weight
accumulation from appearance likelihoods, weighted-mean estimation, and
conditional systematic resampling (ESS-gated) with no data-dependent control
flow — the resample branch is computed unconditionally and selected with
`jnp.where`, so the whole step traces to one static XLA program.

Semantics match the NumPy oracle (oracle/numpy_filter.py) bit-for-bit on
resampling index sequences given identical noise draws; randomness is
counter-based (`jax.random.fold_in(key, frame_idx)`) so trajectories are
reproducible across jit/eager/CPU/TPU and across restarts (SURVEY.md §7
"Determinism under jit/sharding").

State layout (shared with the oracle): particles[..., 5] = [x, y, vx, vy, log_s].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vitparticlefiltertracker_tpu.ops.resample import systematic_resample_indices

STATE_DIM = 5


class MotionParams(NamedTuple):
    sigma_pos: float = 4.0
    sigma_vel: float = 1.0
    sigma_scale: float = 0.0
    vel_decay: float = 0.95


class PFParams(NamedTuple):
    motion: MotionParams = MotionParams()
    ess_threshold: float = 0.5
    init_sigma_pos: float = 2.0
    init_sigma_vel: float = 1.0


class PFState(NamedTuple):
    particles: jax.Array  # [N, 5] float32
    log_weights: jax.Array  # [N] float32, normalized (logsumexp == 0)


class StepNoise(NamedTuple):
    """One frame's random draws, in a fixed order so the oracle can replay."""

    pos: jax.Array  # [N, 2] standard normal
    vel: jax.Array  # [N, 2] standard normal
    scale: jax.Array  # [N] standard normal
    resample_u: jax.Array  # [] uniform [0, 1)


def draw_step_noise(key: jax.Array, n: int, dtype=jnp.float32) -> StepNoise:
    """Fixed draw order: pos, vel, scale normals then the resampling uniform."""
    k_pos, k_vel, k_scale, k_u = jax.random.split(key, 4)
    return StepNoise(
        pos=jax.random.normal(k_pos, (n, 2), dtype),
        vel=jax.random.normal(k_vel, (n, 2), dtype),
        scale=jax.random.normal(k_scale, (n,), dtype),
        resample_u=jax.random.uniform(k_u, (), dtype),
    )


def init_state(
    key: jax.Array,
    center: jax.Array,
    n: int,
    params: PFParams,
    dtype=jnp.float32,
) -> PFState:
    """Particle cloud around the initial bbox center (SURVEY.md §3.2(b))."""
    k_pos, k_vel = jax.random.split(key)
    p = jnp.zeros((n, STATE_DIM), dtype)
    p = p.at[:, 0:2].set(
        center.astype(dtype)[None, :]
        + params.init_sigma_pos * jax.random.normal(k_pos, (n, 2), dtype)
    )
    p = p.at[:, 2:4].set(params.init_sigma_vel * jax.random.normal(k_vel, (n, 2), dtype))
    logw = jnp.full((n,), -jnp.log(jnp.asarray(n, dtype)), dtype)
    return PFState(particles=p, log_weights=logw)


def propagate(particles: jax.Array, noise: StepNoise, motion: MotionParams) -> jax.Array:
    """x' = x + v + sigma_pos*eps; v' = decay*v + sigma_vel*eps; log_s' += sigma_s*eps."""
    pos = particles[:, 0:2] + particles[:, 2:4] + motion.sigma_pos * noise.pos
    vel = motion.vel_decay * particles[:, 2:4] + motion.sigma_vel * noise.vel
    log_s = particles[:, 4] + motion.sigma_scale * noise.scale
    return jnp.concatenate([pos, vel, log_s[:, None]], axis=1)


def normalize_log_weights(log_weights: jax.Array) -> jax.Array:
    return log_weights - jax.scipy.special.logsumexp(log_weights)


def effective_sample_size(log_weights: jax.Array) -> jax.Array:
    w = jnp.exp(normalize_log_weights(log_weights))
    return 1.0 / jnp.sum(w * w)


def estimate_state(particles: jax.Array, log_weights: jax.Array) -> jax.Array:
    """Posterior weighted-mean state — the per-frame tracked position
    (reference README.md:42 "output the tracked positions")."""
    w = jnp.exp(normalize_log_weights(log_weights))
    return jnp.sum(w[:, None] * particles, axis=0)


class StepOut(NamedTuple):
    state: PFState
    estimate: jax.Array  # [5] posterior mean state
    ess: jax.Array  # [] effective sample size (post-weight, pre-resample)
    resampled: jax.Array  # [] bool


def pf_update(
    particles: jax.Array,
    log_weights: jax.Array,
    log_likelihood: jax.Array,
    resample_u: jax.Array,
    params: PFParams,
) -> StepOut:
    """Weight -> estimate -> ESS-gated resample on already-propagated particles.

    Entirely branch-free: the resampled and non-resampled successors are both
    formed and selected by `where`, keeping one static jitted program
    (oracle equivalent: oracle/numpy_filter.py:step).
    """
    n = particles.shape[0]
    dtype = particles.dtype

    log_w = normalize_log_weights(log_weights + log_likelihood.astype(dtype))
    est = estimate_state(particles, log_w)

    ess = effective_sample_size(log_w)
    do_resample = ess < params.ess_threshold * n

    w = jnp.exp(log_w)
    w = w / jnp.sum(w)
    res_idx = systematic_resample_indices(w, resample_u)
    idx = jnp.where(do_resample, res_idx, jnp.arange(n, dtype=jnp.int32))
    new_particles = jnp.take(particles, idx, axis=0)
    uniform = jnp.full((n,), -jnp.log(jnp.asarray(n, dtype)), dtype)
    new_log_w = jnp.where(do_resample, uniform, log_w)

    return StepOut(
        state=PFState(particles=new_particles, log_weights=new_log_w),
        estimate=est,
        ess=ess,
        resampled=do_resample,
    )


def pf_step(
    state: PFState,
    log_likelihood_fn,
    noise: StepNoise,
    params: PFParams,
) -> StepOut:
    """Full SIR step: propagate, then score propagated particles, then update.

    log_likelihood_fn: [N, 5] propagated particles -> [N] log-likelihoods
    (in the tracker this is the ViT appearance likelihood; in tests a
    synthetic closure). Matches the jitted-step op order of SURVEY.md §3.2(a).
    """
    particles = propagate(state.particles, noise, params.motion)
    log_likelihood = log_likelihood_fn(particles)
    return pf_update(particles, state.log_weights, log_likelihood, noise.resample_u, params)
