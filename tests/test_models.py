"""Model-spec invariants and rate-function correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epitpu.models import sir_model, seir_model, sir_subgroups_model


def test_sir_spec():
    m = sir_model()
    assert m.num_compartments == 3
    assert m.num_reactions == 2
    assert m.sources_unique
    # mass conservation: every reaction moves exactly one individual
    assert (m.stoich.sum(axis=1) == 0).all()


def test_sir_rates_match_reference_formulas():
    # reference gillespie_algo.py:37-40: a0 = beta*S*I/N, a1 = gamma*I
    m = sir_model()
    x = jnp.array([4800.0, 20.0, 0.0])
    theta = jnp.array([2.0, 1.0])
    a = m.rate_fn(x, theta)
    n = 4820.0
    np.testing.assert_allclose(a, [2.0 * 4800 * 20 / n, 1.0 * 20], rtol=1e-6)


def test_sir_rates_batched():
    m = sir_model()
    x = jnp.tile(jnp.array([4800.0, 20.0, 0.0]), (7, 1))
    a = m.rate_fn(x, jnp.array([2.0, 1.0]))
    assert a.shape == (7, 2)


def test_seir_rates():
    # reference gillespie_algo.py:106-110
    m = seir_model()
    x = jnp.array([4800.0, 5.0, 20.0, 0.0])
    theta = jnp.array([4.0, 1.0, 1.0])
    a = m.rate_fn(x, theta)
    n = 4825.0
    np.testing.assert_allclose(
        a, [4.0 * 4800 * 20 / n, 1.0 * 5.0, 1.0 * 20.0], rtol=1e-6
    )


def test_subgroups_rates_reference_transpose():
    """The merged subgroup reactions must reproduce the reference's K^2
    per-pair propensities summed per target group
    (reference gillespie_algo.py:182: beta[pop,pop2]*s_pop2*i_pop/sum(N))."""
    k = 2
    m = sir_subgroups_model(k=k, reference_dynamics=True)
    beta = np.array([[5.0, 2.0], [1.0, 3.0]])
    gamma = 0.5
    theta = jnp.asarray(np.concatenate([beta.reshape(-1), [gamma]]), jnp.float32)
    x = jnp.array([2000.0, 30.0, 0.0, 3000.0, 40.0, 0.0])
    a = np.asarray(m.rate_fn(x, theta))
    s = [2000.0, 3000.0]
    i = [30.0, 40.0]
    n_tot = 5070.0
    for g in range(k):
        expected_infect = sum(beta[pop, g] * s[g] * i[pop] / n_tot for pop in range(k))
        np.testing.assert_allclose(a[g], expected_infect, rtol=1e-5)
        np.testing.assert_allclose(a[k + g], gamma * i[g], rtol=1e-6)


def test_subgroups_aggregated_observe():
    m = sir_subgroups_model(k=2, aggregated_obs=True)
    x = jnp.array([2000.0, 30.0, 1.0, 3000.0, 40.0, 2.0])
    y = m.observe_map(x)
    np.testing.assert_allclose(y, [5000.0, 70.0, 3.0])
    assert m.obs_dim == 3


def test_init_fns():
    key = jax.random.PRNGKey(0)
    m = sir_model()
    x0 = m.init_fn(key, 100, 4820, 20.0)
    assert x0.shape == (100, 3)
    np.testing.assert_allclose(np.asarray(x0).sum(axis=1), 4820.0)
    assert 10 < np.asarray(x0)[:, 1].mean() < 30

    m2 = seir_model()
    x0 = m2.init_fn(key, 100, 4820, 20.0)
    assert x0.shape == (100, 4)
    assert (np.asarray(x0)[:, 1] == 0).all()  # E starts 0

    m3 = sir_subgroups_model(k=2)
    x0 = m3.init_fn(key, 50, jnp.array([2030.0, 3040.0]), jnp.array([30.0, 40.0]))
    assert x0.shape == (50, 6)
    np.testing.assert_allclose(np.asarray(x0)[:, :3].sum(axis=1), 2030.0)
    np.testing.assert_allclose(np.asarray(x0)[:, 3:].sum(axis=1), 3040.0)


def test_invalid_model_rejected():
    from epitpu.models import make_model

    with pytest.raises(ValueError):
        make_model(
            name="bad",
            compartments=("a", "b"),
            stoich=np.array([[1, -1]]),  # source a must be decremented
            source=np.array([0]),
            rate_fn=lambda x, t: x[..., :1],
            theta_dim=1,
            theta_names=("r",),
        )


def test_user_defined_sirs_model_end_to_end():
    """The framework is generic over ANY CompartmentModel built with
    make_model (the reference hard-codes each model as its own Gillespie
    loop + ModelType branch).  A user-defined SIRS model (waning immunity
    R -> S) must work end to end: device tau-leap vs the generic exact-SSA
    oracle, the particle filter, and a short PMMH run."""
    import jax
    import jax.numpy as jnp

    from epitpu.models.base import make_model
    from epitpu.observe import get_observation_model
    from epitpu.sim import advance, simulate
    from epitpu.sim.exact import exact_advance
    from epitpu.smc import particle_filter_jit

    def rates(x, theta):
        beta, gamma, omega = theta[..., 0], theta[..., 1], theta[..., 2]
        s, i, r = x[..., 0], x[..., 1], x[..., 2]
        n = s + i + r
        return jnp.stack(
            [beta * s * i / jnp.maximum(n, 1.0), gamma * i, omega * r],
            axis=-1,
        )

    def init(key, n_particles, n_population, mu):
        i0 = jax.random.poisson(key, mu, shape=(n_particles,)).astype(
            jnp.float32
        )
        s0 = n_population - i0
        return jnp.stack([s0, i0, jnp.zeros_like(i0)], axis=-1)

    sirs = make_model(
        name="sirs",
        compartments=("s", "i", "r"),
        stoich=[[-1, 1, 0], [0, -1, 1], [1, 0, -1]],
        source=[0, 1, 2],
        rate_fn=rates,
        theta_dim=3,
        theta_names=("beta", "gamma", "omega"),
        terminal_compartments=(1,),
        init_fn=init,
    )
    theta = jnp.array([2.0, 1.0, 0.3])

    # tau-leap law matches the generic exact-SSA oracle (device while_loop)
    n_runs = 192
    x0 = jnp.broadcast_to(jnp.array([480.0, 20.0, 0.0]), (n_runs, 3))
    xt = np.asarray(
        advance(sirs, jax.random.PRNGKey(0), x0, theta, 3.0, 40)
    )
    x_exact = np.asarray(
        exact_advance(sirs, jax.random.PRNGKey(1), x0, theta, 3.0, 20000)
    )
    assert np.abs(xt.mean(0) - x_exact.mean(0)).max() < 15.0
    # waning immunity visible: R depleted vs plain SIR at the same time
    assert xt[:, 0].mean() > 10.0  # susceptibles replenished

    # filter + PMMH run generically
    rng = np.random.default_rng(5)
    lat = np.asarray(
        simulate(
            sirs, jax.random.PRNGKey(2), jnp.array([480.0, 20.0, 0.0]),
            theta, 7, 20,
        )
    )  # [8, 3] daily states
    y = jnp.asarray(rng.binomial(np.round(lat).astype(int), 0.3).astype(np.float32))
    obs = get_observation_model("binomial")
    res = particle_filter_jit(
        sirs, obs, jax.random.PRNGKey(3), y, theta, 0.3, 128, 500.0, 20.0, 10
    )
    assert np.isfinite(float(res.log_likelihood))

    from epitpu.mcmc import particle_mcmc_jit

    r = particle_mcmc_jit(
        sirs, obs, jax.random.PRNGKey(4), y, theta, 0.05,
        n_iters=30, obs_param=0.3, n_particles=64, n_population=500.0,
        mu=20.0, steps_per_unit=5, n_init_attempts=2,
    )
    th = np.asarray(r.thetas)
    assert th.shape == (30, 3) and np.isfinite(th).all()
