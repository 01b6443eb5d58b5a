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
