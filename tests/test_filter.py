"""JAX particle filter vs. NumPy oracle: identical draws -> identical filter.

SURVEY.md §4.2: "systematic resampling vs. NumPy oracle (exact index match
given same uniform draws)"; trajectory fidelity via shared noise streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitparticlefiltertracker_tpu.filters import particle as pf
from vitparticlefiltertracker_tpu.oracle import numpy_filter as oracle
from vitparticlefiltertracker_tpu.ops.resample import systematic_resample_indices


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [64, 1024])
def test_resample_indices_match_oracle_exactly(seed, n):
    rng = np.random.default_rng(seed)
    w32 = rng.random(n).astype(np.float32)
    w32 /= w32.sum(dtype=np.float32)
    u = np.float32(rng.random())
    got = np.asarray(systematic_resample_indices(jnp.asarray(w32), jnp.asarray(u)))
    want = oracle.systematic_resample_indices(w32.astype(np.float64), float(u))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n,m", [(7, 5), (128, 128), (1000, 333), (16384, 16384)])
def test_ranks_in_sorted_equals_searchsorted_left(n, m):
    """The blocked rank search (the no-`while` searchsorted replacement,
    round-4 VERDICT weak #7) must be element-exact vs jnp.searchsorted on
    adversarial inputs: duplicate keys, queries AT key values (the
    side='left' tie case), and queries outside the key range."""
    rng = np.random.default_rng(n + m)
    from vitparticlefiltertracker_tpu.ops.resample import ranks_in_sorted

    keys = np.sort(rng.integers(0, max(4, n // 2), n).astype(np.float32))
    queries = np.concatenate(
        [
            rng.choice(keys, size=max(1, m // 2)),  # exact ties
            rng.uniform(keys[0] - 1.0, keys[-1] + 1.0, m - max(1, m // 2)),
        ]
    ).astype(np.float32)
    got = np.asarray(ranks_in_sorted(jnp.asarray(keys), jnp.asarray(queries)))
    want = np.searchsorted(keys, queries, side="left")
    assert np.array_equal(got, want)


def test_resample_indices_sorted_and_complete():
    rng = np.random.default_rng(7)
    n = 512
    w = rng.random(n).astype(np.float32)
    w /= w.sum()
    idx = np.asarray(systematic_resample_indices(jnp.asarray(w), jnp.asarray(0.25)))
    assert np.all(np.diff(idx) >= 0)  # systematic => sorted ancestors
    assert idx.min() >= 0 and idx.max() < n


def test_propagate_matches_oracle():
    key = jax.random.key(0)
    n = 256
    motion = pf.MotionParams(sigma_pos=3.0, sigma_vel=0.8, sigma_scale=0.02, vel_decay=0.9)
    particles = jax.random.normal(key, (n, pf.STATE_DIM), jnp.float32) * 10.0
    noise = pf.draw_step_noise(jax.random.fold_in(key, 1), n)
    got = pf.propagate(particles, noise, motion)

    oparams = oracle.OracleParams(
        sigma_pos=3.0, sigma_vel=0.8, sigma_scale=0.02, vel_decay=0.9
    )
    want = oracle.propagate(
        np.asarray(particles, np.float64),
        np.asarray(noise.pos, np.float64),
        np.asarray(noise.vel, np.float64),
        np.asarray(noise.scale, np.float64),
        oparams,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-4)


@pytest.mark.parametrize("ess_threshold", [0.5, 1.1])  # 1.1 => resample every step
def test_multistep_trajectory_matches_oracle(ess_threshold):
    """30 steps of the full SIR loop, JAX vs oracle on shared noise."""
    key = jax.random.key(42)
    n = 512
    motion = pf.MotionParams(sigma_pos=2.0, sigma_vel=0.5, sigma_scale=0.0, vel_decay=0.95)
    params = pf.PFParams(motion=motion, ess_threshold=ess_threshold,
                         init_sigma_pos=2.0, init_sigma_vel=0.5)
    center = jnp.array([50.0, 40.0])

    k_init, k_run = jax.random.split(key)
    state = pf.init_state(k_init, center, n, params)

    ostate = oracle.OracleState(
        particles=np.asarray(state.particles, np.float64),
        log_weights=np.asarray(state.log_weights, np.float64),
    )
    oparams = oracle.OracleParams(
        sigma_pos=2.0, sigma_vel=0.5, sigma_scale=0.0, vel_decay=0.95,
        ess_threshold=ess_threshold,
    )

    update_jit = jax.jit(pf.pf_update)
    true_pos = np.array([50.0, 40.0])
    n_resampled = 0
    for t in range(30):
        true_pos = true_pos + np.array([1.0, -0.5])
        noise = pf.draw_step_noise(jax.random.fold_in(k_run, t), n)
        # Shared synthetic likelihood evaluated at the propagated particles.
        prop_j = pf.propagate(state.particles, noise, motion)
        d2 = jnp.sum((prop_j[:, :2] - jnp.asarray(true_pos, jnp.float32)) ** 2, axis=1)
        loglik = -d2 / (2 * 3.0**2)

        out = update_jit(prop_j, state.log_weights, loglik, noise.resample_u, params)
        state = out.state

        ostate, oest = oracle.step(
            ostate,
            np.asarray(loglik, np.float64),
            np.asarray(noise.pos, np.float64),
            np.asarray(noise.vel, np.float64),
            np.asarray(noise.scale, np.float64),
            float(noise.resample_u),
            oparams,
        )
        n_resampled += int(ostate.resampled)

        assert bool(out.resampled) == ostate.resampled, f"step {t} resample mismatch"
        if ostate.resampled:
            # Exact ancestor-index agreement implies identical particle sets.
            np.testing.assert_allclose(
                np.asarray(state.particles), ostate.particles, rtol=2e-4, atol=2e-3
            )
        np.testing.assert_allclose(
            np.asarray(out.estimate), oest, rtol=2e-4, atol=2e-3
        )
    if ess_threshold > 1.0:
        assert n_resampled == 30


def test_determinism_same_seed_same_trajectory():
    key = jax.random.key(7)
    n = 128
    params = pf.PFParams()

    def run():
        state = pf.init_state(key, jnp.array([10.0, 10.0]), n, params)
        ests = []

        def loglik_fn(p):
            return -jnp.sum(p[:, :2] ** 2, axis=1) / 50.0

        step = jax.jit(lambda s, z: pf.pf_step(s, loglik_fn, z, params))
        for t in range(10):
            noise = pf.draw_step_noise(jax.random.fold_in(key, 100 + t), n)
            out = step(state, noise)
            state = out.state
            ests.append(np.asarray(out.estimate))
        return np.stack(ests)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_jit_eager_equivalence():
    key = jax.random.key(3)
    n = 256
    params = pf.PFParams(ess_threshold=1.1)
    state = pf.init_state(key, jnp.array([0.0, 0.0]), n, params)
    noise = pf.draw_step_noise(jax.random.fold_in(key, 1), n)
    loglik = jax.random.normal(jax.random.fold_in(key, 2), (n,))
    prop = pf.propagate(state.particles, noise, params.motion)
    out_e = pf.pf_update(prop, state.log_weights, loglik, noise.resample_u, params)
    out_j = jax.jit(pf.pf_update)(prop, state.log_weights, loglik, noise.resample_u, params)
    np.testing.assert_allclose(
        np.asarray(out_e.state.particles), np.asarray(out_j.state.particles),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_e.estimate), np.asarray(out_j.estimate), rtol=0, atol=1e-5
    )


def test_vmap_over_banks():
    """B10: independent filter banks via vmap (BASELINE.json:10)."""
    key = jax.random.key(9)
    banks, n = 8, 128
    params = pf.PFParams()
    keys = jax.random.split(key, banks)
    centers = jnp.stack([jnp.array([float(i), 2.0 * i]) for i in range(banks)])
    states = jax.vmap(lambda k, c: pf.init_state(k, c, n, params))(keys, centers)
    noises = jax.vmap(lambda k: pf.draw_step_noise(k, n))(
        jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    )
    logliks = jnp.zeros((banks, n))
    out = jax.jit(
        jax.vmap(
            lambda s, l, z: pf.pf_update(
                pf.propagate(s.particles, z, params.motion),
                s.log_weights, l, z.resample_u, params,
            )
        )
    )(states, logliks, noises)
    assert out.state.particles.shape == (banks, n, pf.STATE_DIM)
    # Uniform likelihood: estimate ~= propagated cloud mean near each center.
    est = np.asarray(out.estimate)
    for i in range(banks):
        assert np.linalg.norm(est[i, :2] - np.array([i, 2.0 * i])) < 2.5
