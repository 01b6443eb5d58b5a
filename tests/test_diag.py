"""Diagnostics vs numpy/scipy ground truth and the reference formulas."""
import numpy as np

from epitpu.diag import (
    acceptance_rate,
    burn_thin,
    ess,
    gelman_rubin,
    hdi,
    posterior_mse,
    running_mean,
    summarize_chain,
)


def test_hdi_normal():
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 1.0, 200_000)
    lo, hi = hdi(x, 0.95)
    assert abs(lo + 1.96) < 0.05
    assert abs(hi - 1.96) < 0.05


def test_hdi_skewed_shorter_than_quantile_interval():
    rng = np.random.default_rng(1)
    x = rng.exponential(1.0, 100_000)
    lo, hi = hdi(x, 0.95)
    qlo, qhi = np.quantile(x, [0.025, 0.975])
    assert (hi - lo) < (qhi - qlo)
    assert lo < 0.05  # HDI of an exponential starts at ~0


def test_gelman_rubin_matches_reference_formula():
    """Cross-check against a literal transcription of helpers.py:15-43."""
    rng = np.random.default_rng(2)
    chains = rng.normal(size=(3, 400, 2))
    chains[1] += 0.3  # make chains disagree a bit

    def reference_impl(chs):
        m = len(chs)
        n, d = chs[0].shape
        means = np.zeros((m, d))
        varis = np.zeros((m, d))
        for i, c in enumerate(chs):
            for j in range(d):
                mu = c[:, j].mean()
                means[i, j] = mu
                varis[i, j] = ((c[:, j] - mu) ** 2).sum() / (n - 1)
        theta_hat = means.mean(axis=0)
        w = varis.mean(axis=0)
        b = n / (m - 1) * ((means - theta_hat) ** 2).sum(axis=0)
        v = (n - 1) / n * w + (m + 1) / (m * n) * b
        return np.sqrt(v / w)

    np.testing.assert_allclose(
        gelman_rubin(chains), reference_impl(list(chains)), rtol=1e-10
    )


def test_gelman_rubin_converged_near_one():
    rng = np.random.default_rng(3)
    chains = rng.normal(size=(4, 2000, 3))
    r = gelman_rubin(chains)
    assert (np.abs(r - 1.0) < 0.02).all()


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 1000))
    e = ess(x)
    assert 2000 < e <= 4400  # iid: ESS ~ M*N


def test_ess_correlated_much_smaller():
    rng = np.random.default_rng(5)
    n = 4000
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = 0.95 * x[i - 1] + rng.normal()
    e = ess(x)
    # AR(1) rho=.95: ESS ~ N*(1-rho)/(1+rho) ~ N/39
    assert e < n / 10


def test_running_mean_matches_reference():
    x = np.arange(10.0)
    rm = running_mean(x, 3)
    # reference helpers.py:46-48
    c = np.cumsum(np.insert(x, 0, 0))
    ref = (c[3:] - c[:-3]) / 3.0
    np.testing.assert_allclose(rm, ref)


def test_posterior_mse():
    chain = np.array([1.0, 2.0, 3.0])
    assert posterior_mse(2.0, chain) == np.mean((chain - 2.0) ** 2)


def test_acceptance_rate_unique_rows():
    th = np.array([[1, 2], [1, 2], [3, 4], [3, 4], [5, 6]])
    assert acceptance_rate(th) == 3 / 5


def test_burn_thin():
    x = np.arange(100)
    out = burn_thin(x, burn_in=10, thin=5)
    np.testing.assert_array_equal(out, np.arange(10, 100, 5))


def test_summarize_chain():
    rng = np.random.default_rng(6)
    th = rng.normal([2.0, 1.0], 0.1, size=(5000, 2))
    s = summarize_chain(th, names=["beta", "gamma"])
    assert abs(s["beta"]["mean"] - 2.0) < 0.02
    assert s["gamma"]["hdi_lo"] < 1.0 < s["gamma"]["hdi_hi"]


def test_pool_chains_burns_every_chain():
    from epitpu.diag import pool_chains

    # burn-in region of BOTH chains carries a sentinel that must vanish
    chains = np.ones((2, 10, 3))
    chains[:, :4, :] = 1e6
    pooled = pool_chains(chains, burn_in=4)
    assert pooled.shape == (12, 3)
    assert np.all(pooled == 1.0)
    # thinning composes
    assert pool_chains(chains, burn_in=4, thin=2).shape == (6, 3)
    # 2-D input treated as one chain
    assert pool_chains(chains[0], burn_in=4).shape == (6, 3)


def test_rank_rhat_iid_near_one():
    from epitpu.diag import gelman_rubin_rank

    rng = np.random.default_rng(3)
    chains = rng.normal(0.0, 1.0, (4, 2000, 2))
    r = gelman_rubin_rank(chains)
    assert r.shape == (2,)
    assert np.all(r < 1.01), r


def test_rank_rhat_detects_within_chain_trend():
    """Split-R-hat catches a drifting chain that the unsplit classic
    estimator can miss when all chains drift identically."""
    from epitpu.diag import gelman_rubin, gelman_rubin_rank

    rng = np.random.default_rng(4)
    n = 1000
    trend = np.linspace(0.0, 4.0, n)
    chains = rng.normal(0.0, 1.0, (4, n)) + trend  # same drift per chain
    classic = gelman_rubin(chains[..., None])[0]
    split_rank = gelman_rubin_rank(chains[..., None])[0]
    assert classic < 1.05  # identical drift hides from the unsplit form
    assert split_rank > 1.25, split_rank


def test_rank_ess_iid_close_to_n():
    from epitpu.diag import ess_rank

    rng = np.random.default_rng(5)
    chains = rng.normal(0.0, 1.0, (4, 1500))
    e = float(ess_rank(chains))
    assert 0.6 * 6000 < e < 1.5 * 6000, e


def test_rank_ess_robust_to_heavy_tails():
    """Cauchy draws break the moment-based classic estimator's stability;
    the rank-normalized one stays near the true (iid) sample size."""
    from epitpu.diag import ess_rank

    rng = np.random.default_rng(6)
    chains = rng.standard_cauchy((4, 1500))
    e = float(ess_rank(chains))
    assert 0.5 * 6000 < e < 1.6 * 6000, e


def test_rank_estimators_constant_chain_guards():
    from epitpu.diag import ess_rank, gelman_rubin_rank

    chains = np.ones((3, 100, 1))
    assert gelman_rubin_rank(chains)[0] == 1.0
    assert float(ess_rank(chains[:, :, 0])) == 300.0


def test_rank_ess_correlated_much_smaller():
    from epitpu.diag import ess_rank

    rng = np.random.default_rng(7)
    n = 4000
    chains = np.empty((2, n))
    for c in range(2):
        x = 0.0
        eps = rng.normal(0.0, 1.0, n)
        out = np.empty(n)
        for i in range(n):
            x = 0.95 * x + eps[i]
            out[i] = x
        chains[c] = out
    e = float(ess_rank(chains))
    # AR(0.95): ESS/N = (1-rho)/(1+rho) ~ 0.026
    assert e < 0.12 * 2 * n, e
