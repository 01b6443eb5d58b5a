"""Observation models vs scipy ground truth (reference pmcmc.py:179-181)."""
import jax.numpy as jnp
import numpy as np
import scipy.stats

from epitpu.observe import (
    binom_logpmf,
    get_observation_model,
    make_binomial_obs,
    make_gaussian_obs,
    normal_logpdf,
)


def test_binom_logpmf_matches_scipy():
    k = np.array([0.0, 3.0, 10.0, 50.0])
    n = np.array([10.0, 10.0, 10.0, 400.0])
    p = 0.1
    ours = np.asarray(binom_logpmf(jnp.asarray(k), jnp.asarray(n), p))
    ref = scipy.stats.binom.logpmf(k, n, p)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_binom_logpmf_out_of_support():
    assert np.isneginf(float(binom_logpmf(11.0, 10.0, 0.1)))
    assert np.isneginf(float(binom_logpmf(-1.0, 10.0, 0.1)))
    # p edge cases
    assert float(binom_logpmf(0.0, 10.0, 0.0)) == 0.0
    assert np.isneginf(float(binom_logpmf(1.0, 10.0, 0.0)))
    assert float(binom_logpmf(10.0, 10.0, 1.0)) == 0.0


def test_normal_logpdf_matches_scipy():
    y, loc, scale = 5.0, 4.0, 2.0
    np.testing.assert_allclose(
        float(normal_logpdf(y, loc, scale)),
        scipy.stats.norm.logpdf(y, loc, scale),
        rtol=1e-5,
    )


def test_min_combine_matches_reference_weighting():
    """Reference weight = min over compartments of per-compartment pmf
    (reference pmcmc.py:179); in log space that is the min of log-pmfs."""
    obs = make_binomial_obs(combine="min")
    y = jnp.array([48.0, 2.0, 0.0])
    x = jnp.array([[480.0, 20.0, 0.0], [470.0, 25.0, 5.0]])
    got = np.asarray(obs(y, x, 0.1))
    ref = np.array(
        [
            min(scipy.stats.binom.logpmf(y_i, x_row, 0.1) for y_i, x_row in zip(np.asarray(y), row))
            for row in np.asarray(x)
        ]
    )
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_sum_combine_is_product_likelihood():
    obs = make_binomial_obs(combine="sum")
    y = jnp.array([48.0, 2.0, 0.0])
    x = jnp.array([480.0, 20.0, 0.0])
    got = float(obs(y, x, 0.1))
    ref = scipy.stats.binom.logpmf(np.asarray(y), np.asarray(x), 0.1).sum()
    np.testing.assert_allclose(got, ref, rtol=5e-4)


def test_gaussian_obs_matches_reference_scale():
    """Reference: norm.pdf(Y, X, probs*X + 1e-4) (pmcmc.py:181)."""
    obs = make_gaussian_obs(combine="min")
    y = jnp.array([100.0, 55.0])
    x = jnp.array([98.0, 50.0])
    noise = 0.1
    got = float(obs(y, x, noise))
    ref = min(
        scipy.stats.norm.logpdf(
            np.asarray(y)[i], np.asarray(x)[i], 0.1 * np.asarray(x)[i] + 1e-4
        )
        for i in range(2)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_get_observation_model():
    assert get_observation_model("binomial") is not None
    assert get_observation_model("gaussian") is not None
    try:
        get_observation_model("nope")
        assert False
    except ValueError:
        pass
