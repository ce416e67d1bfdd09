"""Oracle self-consistency tests: the NumPy filter behaves like a textbook SIR."""

import numpy as np

from vitparticlefiltertracker_tpu.oracle import numpy_filter as oracle


def test_systematic_resample_matches_multinomial_expectation():
    # Counts of each ancestor must be floor/ceil of N*w (systematic property).
    rng = np.random.default_rng(0)
    n = 512
    w = rng.random(n)
    w /= w.sum()
    idx = oracle.systematic_resample_indices(w, u=0.37)
    counts = np.bincount(idx, minlength=n)
    expected = n * w
    assert np.all(counts >= np.floor(expected) - 1e-9)
    assert np.all(counts <= np.ceil(expected) + 1e-9)
    assert counts.sum() == n


def test_systematic_resample_degenerate_weight():
    n = 64
    w = np.zeros(n)
    w[17] = 1.0
    idx = oracle.systematic_resample_indices(w, u=0.5)
    assert np.all(idx == 17)


def test_systematic_resample_uniform_weights_identity_like():
    n = 128
    w = np.full(n, 1.0 / n)
    idx = oracle.systematic_resample_indices(w, u=0.5)
    # With uniform weights each particle survives exactly once.
    assert np.array_equal(np.sort(idx), np.arange(n))


def test_propagate_moments():
    rng = np.random.default_rng(1)
    n = 200_000
    params = oracle.OracleParams(sigma_pos=3.0, sigma_vel=0.5, vel_decay=0.9)
    p = np.zeros((n, oracle.STATE_DIM))
    p[:, 2] = 2.0  # vx
    out = oracle.propagate(
        p, rng.standard_normal((n, 2)), rng.standard_normal((n, 2)),
        rng.standard_normal(n), params,
    )
    # E[x'] = x + vx = 2.0; std[x'] = sigma_pos
    assert abs(out[:, 0].mean() - 2.0) < 0.05
    assert abs(out[:, 0].std() - 3.0) < 0.05
    # E[vx'] = 0.9 * 2.0
    assert abs(out[:, 2].mean() - 1.8) < 0.01


def test_ess_bounds():
    n = 100
    logw = np.full(n, -np.log(n))
    assert abs(oracle.effective_sample_size(logw) - n) < 1e-6
    logw = np.full(n, -1e9)
    logw[3] = 0.0
    assert abs(oracle.effective_sample_size(logw) - 1.0) < 1e-6


def test_full_step_tracks_synthetic_target():
    """SIR filter on a synthetic Gaussian likelihood locks onto the target."""
    rng = np.random.default_rng(42)
    n = 1024
    params = oracle.OracleParams(sigma_pos=2.0, sigma_vel=0.5, ess_threshold=0.5)
    state = oracle.init_state(
        np.array([50.0, 50.0]), n,
        rng.standard_normal((n, 2)), rng.standard_normal((n, 2)),
        init_sigma_pos=2.0, init_sigma_vel=0.5,
    )
    true_pos = np.array([50.0, 50.0])
    vel = np.array([1.5, -0.7])
    errs = []
    for _ in range(40):
        true_pos = true_pos + vel
        d2 = ((state.particles[:, :2] + state.particles[:, 2:4]) - true_pos) ** 2
        # Likelihood evaluated at propagated positions is approximated by
        # scoring the pre-propagation prediction; good enough for lock-on.
        loglik = -(d2.sum(axis=1)) / (2 * 4.0**2)
        state, est = oracle.step(
            state, loglik,
            rng.standard_normal((n, 2)), rng.standard_normal((n, 2)),
            rng.standard_normal(n), rng.random(), params,
        )
        errs.append(np.linalg.norm(est[:2] - true_pos))
    assert np.mean(errs[-10:]) < 3.0, f"did not lock on: {errs[-10:]}"
