"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest forces xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epitpu.dist import make_mesh, sharded_particle_filter, sharded_pmmh
from epitpu.models import sir_model
from epitpu.observe import get_observation_model

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)

THETA = jnp.array([2.0, 1.0])


def test_mesh_axes():
    mesh = make_mesh(n_chain_shards=4, n_particle_shards=2)
    assert mesh.shape == {"chain": 4, "particle": 2}


def test_sharded_filter_matches_single_device_scale(sir_dataset):
    """Sharded PF (4 particle shards) must produce a log-likelihood in the
    same range as the single-device filter with the same total N."""
    from epitpu.smc import particle_filter_jit

    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    mesh = make_mesh(n_chain_shards=1, n_particle_shards=4)
    res = sharded_particle_filter(
        mesh, m, obs, jax.random.PRNGKey(0), y, THETA, 0.1, 256
    )
    ll_sharded = float(res.log_likelihood)
    assert np.isfinite(ll_sharded)
    assert res.hidden.shape == (y.shape[0], 256, 3)
    # ancestry indices are GLOBAL
    assert int(jnp.max(res.ancestry)) >= 64

    lls = [
        float(
            particle_filter_jit(
                m, obs, jax.random.PRNGKey(i), y, THETA, 0.1, 256
            ).log_likelihood
        )
        for i in range(5)
    ]
    assert abs(ll_sharded - np.mean(lls)) < 5 * (np.std(lls) + 0.2)


def test_sharded_pmmh_runs_and_recovers(sir_dataset):
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    mesh = make_mesh(n_chain_shards=8, n_particle_shards=1)
    res = sharded_pmmh(
        mesh,
        m,
        obs,
        jax.random.PRNGKey(0),
        y,
        jnp.array([2.0, 1.0]),
        0.05,
        n_chains_total=8,
        n_iters=40,
        n_particles=64,
    )
    assert res.thetas.shape == (8, 40, 2)
    th = np.asarray(res.thetas)
    assert np.isfinite(th).all()
    # chains are independent
    assert not np.allclose(th[0], th[1])
    # pooled posterior should be near the truth even in a short run
    assert abs(th[:, 10:, 0].mean() - 2.0) < 0.6
    assert abs(th[:, 10:, 1].mean() - 1.0) < 0.4


def test_sharded_pmmh_pooled_adaptation(sir_dataset):
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    mesh = make_mesh(n_chain_shards=4, n_particle_shards=1)
    res = sharded_pmmh(
        mesh,
        m,
        obs,
        jax.random.PRNGKey(1),
        y,
        jnp.array([2.0, 1.0]),
        0.3,
        n_chains_total=8,
        n_iters=30,
        n_particles=32,
        adaptive=True,
        adapt_start=10,
        pooled_adaptation=True,
    )
    assert np.isfinite(np.asarray(res.thetas)).all()
