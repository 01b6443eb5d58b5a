"""Likelihood-surface exploration + offline MH re-screening
(reference tests/testing_sbgrps.py:35-91 counterpart)."""
import jax
import jax.numpy as jnp
import numpy as np

from epitpu.diag import (
    high_likelihood_map,
    likelihood_surface,
    offline_rescreen,
    theta_grid,
)
from epitpu.models import sir_model
from epitpu.observe import get_observation_model


def test_theta_grid_shape():
    g = theta_grid([(0.5, 3.5), (0.5, 1.5)], 5)
    assert g.shape == (25, 2)
    assert g.min() >= 0.5 and g.max() <= 3.5


def test_surface_peaks_near_truth(sir_dataset):
    y, _ = sir_dataset
    grid = theta_grid([(0.5, 4.0), (0.4, 2.0)], 6)
    lls = likelihood_surface(
        sir_model(), get_observation_model("binomial"),
        jax.random.PRNGKey(0), y, grid,
        obs_param=0.1, n_particles=128, steps_per_unit=5,
    )
    assert lls.shape == (36,)
    best = grid[int(np.nanargmax(np.where(np.isfinite(lls), lls, -np.inf)))]
    # the argmax grid point lands near (beta=2, gamma=1)
    assert abs(best[0] - 2.0) <= 1.0 and abs(best[1] - 1.0) <= 0.5

    mask, high = high_likelihood_map(grid, lls, quantile=0.75)
    assert 0 < mask.sum() <= 12
    assert high.shape[1] == 2
    # the truth-adjacent point survives the map
    d = np.linalg.norm(high - np.array([2.0, 1.0]), axis=1)
    assert d.min() < 1.0


def test_offline_rescreen_logspace():
    rng = np.random.default_rng(0)
    thetas = rng.normal([2.0, 1.0], 0.3, size=(200, 2)).astype(np.float32)
    # likelihood strongly favors theta near the truth
    lls = (-20.0 * ((thetas - [2.0, 1.0]) ** 2).sum(1)).astype(np.float32)
    chain, acc = offline_rescreen(jax.random.PRNGKey(1), thetas, lls)
    assert chain.shape == thetas.shape
    assert 1 <= acc <= 200
    # re-screened chain concentrates: posterior sd shrinks vs raw draws
    assert chain[50:].std(0).max() < thetas.std(0).max()
    # -inf likelihood rows are never accepted
    lls_bad = lls.copy(); lls_bad[10:] = -np.inf
    chain2, acc2 = offline_rescreen(jax.random.PRNGKey(2), thetas, lls_bad)
    assert (chain2[10:] == chain2[9]).all()
