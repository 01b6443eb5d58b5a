"""PMMH correctness: posterior recovery on simulated data and the reference's
MCMC-health checks (SURVEY.md sections 4.3-4.4), kept small enough for CI."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epitpu.models import sir_model
from epitpu.observe import get_observation_model
from epitpu.mcmc import Welford, particle_mcmc_chains, particle_mcmc_jit


@pytest.fixture(scope="module")
def short_chain(sir_dataset):
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    return particle_mcmc_jit(
        m,
        obs,
        jax.random.PRNGKey(0),
        y,
        jnp.array([2.0, 1.0]),
        0.05,
        n_iters=300,
        obs_param=0.1,
        n_particles=128,
        steps_per_unit=20,
    )


def test_chain_shapes(short_chain, sir_dataset):
    y, _ = sir_dataset
    r = short_chain
    assert r.thetas.shape == (300, 2)
    assert r.log_likelihoods.shape == (300,)
    assert r.sampled_trajs.shape == (300, y.shape[0], 3)
    assert np.isfinite(np.asarray(r.thetas)).all()


def test_posterior_brackets_truth(short_chain):
    """Posterior from a short chain should still bracket (beta, gamma) =
    (2, 1) — the reference's recovery criterion (SURVEY.md section 4.3)."""
    th = np.asarray(short_chain.thetas)[50:]
    for j, true in enumerate((2.0, 1.0)):
        lo, hi = np.quantile(th[:, j], [0.025, 0.975])
        assert lo < true < hi, (j, lo, true, hi)
        assert abs(th[:, j].mean() - true) < 0.4


def test_acceptance_rate_sane(short_chain):
    """Acceptance = reference's unique-row fraction (tests/test_pmcmc_noisy.py:240).
    Must be within MCMC-healthy range and equal the unique-count measure."""
    r = short_chain
    rate = float(r.acceptance_rate())
    assert 0.01 < rate < 0.9
    th = np.asarray(r.thetas)
    uniq = len(np.unique(th, axis=0)) / th.shape[0]
    assert abs(uniq - rate) < 0.05


def test_rejected_iterations_copy_previous(short_chain):
    """On reject the chain must copy theta, likelihood AND trajectory
    (reference pmcmc.py:400-403)."""
    th = np.asarray(short_chain.thetas)
    lls = np.asarray(short_chain.log_likelihoods)
    trajs = np.asarray(short_chain.sampled_trajs)
    repeats = np.where((th[1:] == th[:-1]).all(axis=1))[0]
    assert len(repeats) > 0
    i = repeats[0] + 1
    assert lls[i] == lls[i - 1]
    np.testing.assert_array_equal(trajs[i], trajs[i - 1])


def test_infer_reporting_probability(sir_dataset):
    """probs=None mode: p is the extra theta component, clamped to [0,1]
    (reference pmcmc.py:283-287, 339-343; tests/test_pmcmc_p.py)."""
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    r = particle_mcmc_jit(
        m,
        obs,
        jax.random.PRNGKey(3),
        y,
        jnp.array([2.0, 1.0, 0.1]),
        0.02,
        n_iters=300,
        infer_obs_param=True,
        n_particles=128,
    )
    th = np.asarray(r.thetas)
    assert th.shape == (300, 3)
    p = th[:, 2]
    assert (p >= 0).all() and (p <= 1).all()
    assert abs(np.mean(p[50:]) - 0.1) < 0.08


def test_adaptive_covariance(sir_dataset):
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    r = particle_mcmc_jit(
        m,
        obs,
        jax.random.PRNGKey(4),
        y,
        jnp.array([2.0, 1.0]),
        0.3,
        adaptive=True,
        n_iters=200,
        n_particles=64,
        adapt_start=50,
    )
    assert np.isfinite(np.asarray(r.thetas)).all()
    assert float(r.acceptance_rate()) > 0.005


def test_parallel_chains_vmap(sir_dataset):
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    r = particle_mcmc_chains(
        m,
        obs,
        jax.random.PRNGKey(5),
        y,
        jnp.array([2.0, 1.0]),
        0.05,
        n_chains=3,
        n_iters=50,
        n_particles=64,
    )
    assert r.thetas.shape == (3, 50, 2)
    # chains must differ (independent keys)
    th = np.asarray(r.thetas)
    assert not np.allclose(th[0], th[1])


def test_welford_matches_numpy_cov():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(500, 3)).astype(np.float32)
    w = Welford.init(3)
    for x in xs:
        w = w.update(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(w.covariance(jitter=0.0)),
        np.cov(xs.T, ddof=0),
        rtol=2e-3,
        atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(w.mean), xs.mean(axis=0), atol=1e-4)
