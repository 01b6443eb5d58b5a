"""Particle-filter behavior: the reference's de facto verification methods
made automatic (SURVEY.md section 4.1: likelihood-estimator consistency)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epitpu.models import sir_model, sir_subgroups_model
from epitpu.observe import get_observation_model
from epitpu.smc import particle_filter_jit, sample_path

THETA = jnp.array([2.0, 1.0])


def _ll(y, theta, key, n, **kw):
    m = sir_model()
    obs = get_observation_model("binomial")
    return particle_filter_jit(
        m, obs, key, y, theta, 0.1, n, 4820, 20.0, **kw
    ).log_likelihood


def test_filter_shapes(sir_dataset):
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(m, obs, jax.random.PRNGKey(0), y, THETA, 0.1, 128)
    t = y.shape[0]
    assert res.hidden.shape == (t, 128, 3)
    assert res.ancestry.shape == (t, 128)
    assert res.log_zetas.shape == (t,)
    assert np.isfinite(float(res.log_likelihood))
    assert not bool(res.degenerate)
    # ancestry row 0 is zeros (reference leaves it unwritten, pmcmc.py:152)
    assert (np.asarray(res.ancestry[0]) == 0).all()


def test_likelihood_consistency_variance_shrinks(sir_dataset):
    """Reference method: PF at N in {10,100,1000}, mean stable, variance
    shrinking (reference tests/test_particles_noisy.py:36-88)."""
    y, _ = sir_dataset
    stats = {}
    for n in (16, 1024):
        lls = [float(_ll(y, THETA, jax.random.PRNGKey(100 * n + i), n)) for i in range(10)]
        stats[n] = (np.mean(lls), np.std(lls))
    # an order of magnitude more particles must not increase spread, and the
    # estimator mean must be stable across N (unbiasedness)
    assert stats[1024][1] < stats[16][1]
    assert abs(stats[1024][0] - stats[16][0]) < 3.0 * (stats[16][1] + 0.1)


def test_likelihood_peaks_at_true_theta(sir_dataset):
    y, _ = sir_dataset
    ll_true = float(_ll(y, THETA, jax.random.PRNGKey(0), 512))
    for bad in ([1.2, 1.0], [3.0, 1.0], [2.0, 0.5], [2.0, 1.6]):
        ll_bad = float(_ll(y, jnp.array(bad), jax.random.PRNGKey(0), 512))
        assert ll_true > ll_bad + 5.0, (bad, ll_true, ll_bad)


def test_degenerate_data_gives_neg_inf():
    """Impossible observations (more observed than latent) must yield -inf
    log-likelihood and a degeneracy flag, not a crash — the analogue of the
    reference's (None, None, None) return (pmcmc.py:187-192)."""
    y = jnp.asarray(
        np.array([[480.0, 2.0, 0.0], [1e6, 1e6, 1e6], [480.0, 2.0, 0.0]]),
        jnp.float32,
    )
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(m, obs, jax.random.PRNGKey(0), y, THETA, 0.1, 64)
    assert np.isneginf(float(res.log_likelihood))
    assert bool(res.degenerate)
    assert np.isfinite(np.asarray(res.hidden)).all()


def test_multinomial_resampling_mode(sir_dataset):
    y, _ = sir_dataset
    ll = float(
        _ll(y, THETA, jax.random.PRNGKey(0), 256, resampling="multinomial")
    )
    assert np.isfinite(ll)


def test_gaussian_observation_filter(sir_dataset):
    """Noisy-counts variant (reference observations=True path)."""
    _, latent = sir_dataset
    rng = np.random.default_rng(7)
    noise = 0.1
    y = jnp.asarray(
        rng.normal(latent, noise * latent + 1e-4).astype(np.float32)
    )
    m = sir_model()
    obs = get_observation_model("gaussian")
    res = particle_filter_jit(m, obs, jax.random.PRNGKey(0), y, THETA, noise, 256)
    assert np.isfinite(float(res.log_likelihood))


def test_subgroups_aggregated_filter():
    """SIR_SUBGROUPS2: latent per-group state, aggregated observations
    (reference pmcmc.py:172-175, tests/test_particles_subroups2.py:42-45)."""
    from epitpu.sim import simulate

    k = 2
    m = sir_subgroups_model(k=k, aggregated_obs=True)
    beta = np.array([[5.0, 2.0], [1.0, 3.0]])
    theta = jnp.asarray(np.concatenate([beta.reshape(-1), [0.5]]), jnp.float32)
    x0 = jnp.array([[2000.0, 30.0, 0.0, 3000.0, 40.0, 0.0]])
    latent = np.asarray(simulate(m, jax.random.PRNGKey(5), x0, theta, 10, 40))[:, 0, :]
    agg = latent[:, :3] + latent[:, 3:]
    rng = np.random.default_rng(8)
    y = jnp.asarray(rng.binomial(agg.astype(int), 0.1).astype(np.float32))
    obs = get_observation_model("binomial")
    res = particle_filter_jit(
        m, obs, jax.random.PRNGKey(0), y, theta, 0.1, 128,
        jnp.array([2030.0, 3040.0]), jnp.array([30.0, 40.0]),
    )
    assert res.hidden.shape == (11, 128, 6)
    assert np.isfinite(float(res.log_likelihood))


def test_sample_path_consistency(sir_dataset):
    """Sampled path must follow the genealogy: every transition must be a
    state that actually exists in the filter history."""
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(m, obs, jax.random.PRNGKey(0), y, THETA, 0.1, 64)
    path = sample_path(jax.random.PRNGKey(9), res.hidden, res.ancestry)
    assert path.shape == (y.shape[0], 3)
    hidden = np.asarray(res.hidden)
    p = np.asarray(path)
    for t in range(y.shape[0]):
        assert any(np.allclose(p[t], hidden[t, j]) for j in range(64)), t
    # population conserved along the path
    np.testing.assert_allclose(p.sum(axis=1), p.sum(axis=1)[0], atol=1e-3)


def test_filter_under_vmap(sir_dataset):
    """The PF must vmap over a chains axis (theta batched)."""
    from epitpu.smc import particle_filter

    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    thetas = jnp.array([[2.0, 1.0], [1.5, 0.8], [2.5, 1.2]])
    keys = jax.random.split(jax.random.PRNGKey(0), 3)

    fn = jax.jit(
        jax.vmap(
            lambda k, th: particle_filter(
                m, obs, k, y, th, 0.1, n_particles=64
            ).log_likelihood
        )
    )
    lls = fn(keys, thetas)
    assert lls.shape == (3,)
    assert np.isfinite(np.asarray(lls)).all()


def test_conditional_resampling_skips_healthy_steps(sir_dataset):
    """resample_threshold < 1: steps with ESS >= alpha*N keep identity
    ancestry and carry weights; the filter stays finite and the terminal
    log-weights are normalized."""
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(
        m, obs, jax.random.PRNGKey(0), y, THETA, 0.1, 256,
        4820, 20.0, resample_threshold=0.5,
    )
    assert np.isfinite(float(res.log_likelihood))
    anc = np.asarray(res.ancestry[1:])  # row 0 is unwritten zeros
    iota = np.arange(256)
    identity_rows = np.array([(row == iota).all() for row in anc])
    # with alpha=0.5 on this dataset at 256 particles some steps skip
    # resampling and some don't (both code paths exercised)
    assert identity_rows.any()
    assert not identity_rows.all()
    # terminal weights normalized: logsumexp == 0
    lse = float(jax.scipy.special.logsumexp(res.final_logw))
    np.testing.assert_allclose(lse, 0.0, atol=1e-4)
    # always-resample keeps uniform terminal weights
    res1 = particle_filter_jit(
        m, obs, jax.random.PRNGKey(0), y, THETA, 0.1, 256, 4820, 20.0,
    )
    np.testing.assert_allclose(
        np.asarray(res1.final_logw), -np.log(256.0), rtol=1e-6
    )


def test_conditional_resampling_estimator_consistent(sir_dataset):
    """Both alpha=1 (always resample) and alpha=0.5 are unbiased estimators
    of the same marginal likelihood: their mean log-Z agree within joint MC
    error, and conditional resampling does not inflate the variance."""
    y, _ = sir_dataset
    keys = jax.random.split(jax.random.PRNGKey(7), 24)
    ll_always = np.asarray(
        jax.vmap(lambda k: _ll(y, THETA, k, 512))(keys)
    )
    ll_cond = np.asarray(
        jax.vmap(lambda k: _ll(y, THETA, k, 512, resample_threshold=0.5))(keys)
    )
    assert np.isfinite(ll_always).all() and np.isfinite(ll_cond).all()
    se = np.sqrt(ll_always.var() / 24 + ll_cond.var() / 24)
    assert abs(ll_always.mean() - ll_cond.mean()) < 4 * se + 0.5
    # variance should not blow up (usually shrinks)
    assert ll_cond.std() < 2.0 * ll_always.std() + 0.1


def test_conditional_resampling_degenerate_still_neg_inf():
    y_bad = jnp.full((6, 3), 1e9, dtype=jnp.float32)
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(
        m, obs, jax.random.PRNGKey(0), y_bad, THETA, 0.1, 64,
        4820, 20.0, resample_threshold=0.5,
    )
    assert bool(res.degenerate)
    assert float(res.log_likelihood) == -np.inf
    assert np.isfinite(np.asarray(res.final_logw)).all()


@pytest.mark.parametrize("every", [2, 4])
def test_resample_every_schedule(sir_dataset, every):
    """Static resample schedule: off-steps keep identity ancestry, scheduled
    steps resample; estimator consistent with always-resample.  every=4 is
    the production bench configuration."""
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(
        m, obs, jax.random.PRNGKey(1), y, THETA, 0.1, 256,
        4820, 20.0, resample_every=every,
    )
    assert np.isfinite(float(res.log_likelihood))
    anc = np.asarray(res.ancestry[1:])
    iota = np.arange(256)
    identity_rows = np.array([(row == iota).all() for row in anc])
    # schedule: scan steps p=1..T-1 resample iff p % every == 0
    expect_skip = (np.arange(1, y.shape[0]) % every) != 0
    assert (identity_rows == expect_skip).all(), (
        identity_rows, expect_skip
    )

    # estimator consistency vs always-resample across seeds
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    ll_always = np.asarray(jax.vmap(lambda k: _ll(y, THETA, k, 512))(keys))
    ll_sched = np.asarray(
        jax.vmap(lambda k: _ll(y, THETA, k, 512, resample_every=every))(keys)
    )
    se = np.sqrt(ll_always.var() / 16 + ll_sched.var() / 16)
    assert abs(ll_always.mean() - ll_sched.mean()) < 4 * se + 0.5


def test_resample_every_composes_with_threshold(sir_dataset):
    """resample_every=2 + ESS threshold: scheduled steps may still skip when
    ESS is healthy; filter stays finite and consistent."""
    y, _ = sir_dataset
    m = sir_model()
    obs = get_observation_model("binomial")
    res = particle_filter_jit(
        m, obs, jax.random.PRNGKey(2), y, THETA, 0.1, 256,
        4820, 20.0, resample_threshold=0.5, resample_every=2,
    )
    assert np.isfinite(float(res.log_likelihood))
    anc = np.asarray(res.ancestry[1:])
    iota = np.arange(256)
    identity_rows = np.array([(row == iota).all() for row in anc])
    # every odd scan step is schedule-skipped
    assert identity_rows[(np.arange(1, y.shape[0]) % 2) != 0].all()


def test_record_history_off_same_loglik(sir_dataset):
    """record_history=False must not perturb the filter's randomness or
    likelihood — it only skips the hidden/ancestry stacking."""
    import jax

    from epitpu.models import sir_model
    from epitpu.observe import get_observation_model
    from epitpu.smc import particle_filter

    y, _ = sir_dataset
    model, obs = sir_model(), get_observation_model("binomial")
    import jax.numpy as jnp

    def run(record):
        return particle_filter(
            model, obs, jax.random.PRNGKey(3), y,
            jnp.array([2.0, 1.0]), 0.1, n_particles=64, steps_per_unit=4,
            record_history=record,
        )

    full = jax.jit(lambda: run(True))()
    fast = jax.jit(lambda: run(False))()
    assert float(full.log_likelihood) == float(fast.log_likelihood)
    assert fast.hidden.shape == (1, 64, 3)
    assert fast.ancestry.shape == (1, 64)
    assert np.array_equal(np.asarray(full.log_zetas[-1:]),
                          np.asarray(fast.log_zetas[-1:]))


def test_tune_particles_scales_with_information(sir_dataset):
    """The self-sizing rule picks more particles when observations are
    sharper (lower Gaussian noise -> sharper weights -> noisier logZ at
    fixed N), and the returned sd meets the target."""
    import jax
    import jax.numpy as jnp

    from epitpu.cli.run import generate_dataset
    from epitpu.cli.configs import DataConfig, ExperimentConfig
    from epitpu.models import sir_model
    from epitpu.observe import get_observation_model
    from epitpu.smc import tune_particles

    model = sir_model()
    obs = get_observation_model("gaussian")
    theta = jnp.array([2.0, 1.0])

    def pick(noise):
        cfg = ExperimentConfig(
            data=DataConfig(observation="gaussian", obs_param=noise, t_max=10)
        )
        y, _ = generate_dataset(cfg)
        n, sd = tune_particles(
            model, obs, jax.random.PRNGKey(0), jnp.asarray(y), theta,
            noise, target_sd=1.0, n_reps=12, start=8, max_particles=512,
            steps_per_unit=5,
        )
        return n, sd

    n_sharp, sd_sharp = pick(0.05)
    n_noisy, sd_noisy = pick(0.3)
    assert n_sharp >= n_noisy, (n_sharp, n_noisy)
    assert sd_noisy <= 1.0
    assert sd_sharp <= 1.0 or n_sharp == 512
