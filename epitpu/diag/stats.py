"""Convergence and posterior diagnostics.

Covers everything the reference gets from helpers.py + arviz:
  * mean + 95% HDI               (reference helpers.py:5-13, az.hdi)
  * Gelman-Rubin R-hat           (reference helpers.py:15-43, same formula)
  * effective sample size        (reference scripts use az.ess,
                                  e.g. tests/test_pmcmc_p.py:309-314)
  * running mean                 (reference helpers.py:46-48)
  * posterior MSE                (reference helpers.py:51-54)
  * acceptance rate as the unique-row fraction
                                 (reference tests/test_pmcmc_noisy.py:240-241)
  * burn-in + thinning helper    (reference tests/test_pmcmc_noisy.py:82-94)

arviz is not a dependency: HDI uses the same shortest-interval construction
as ``az.hdi``; ESS implements the standard Geyer initial-positive-sequence
autocorrelation estimator (the bulk-ESS core of arviz).  All functions accept
numpy or JAX arrays and return numpy.
"""
from __future__ import annotations

import numpy as np


def hdi(samples, prob=0.95):
    """Shortest interval containing ``prob`` mass (az.hdi construction).
    samples: [N] or [N, d] -> (lo, hi) scalars or [d] arrays."""
    a = np.asarray(samples, dtype=float)
    if a.ndim == 2:
        pairs = [hdi(a[:, j], prob) for j in range(a.shape[1])]
        lo, hi = zip(*pairs)
        return np.asarray(lo), np.asarray(hi)
    x = np.sort(a)
    n = len(x)
    m = max(int(np.floor(prob * n)), 1)
    widths = x[m - 1 :] - x[: n - m + 1]
    i = int(np.argmin(widths))
    return x[i], x[i + m - 1]


def mean_credible_interval(data, prob=0.95):
    """Reference helpers.py:5-13: (mean, hdi_lo, hdi_hi).  For 2-D data the
    reference computes the mean per ROW (axis=1) and az.hdi per column; we
    keep that orientation for drop-in parity."""
    a = np.asarray(data, dtype=float)
    if a.ndim == 2:
        m = a.mean(axis=1)
    else:
        m = a.mean()
    lo, hi = hdi(a if a.ndim == 1 else a, prob)
    return m, lo, hi


def gelman_rubin(chains):
    """sqrt(V_hat / W) across chains, exactly the reference formula
    (helpers.py:15-43).  chains: [M, N, d] or list of [N, d] -> [d]."""
    chains = np.asarray(chains, dtype=float)
    m, n, _ = chains.shape
    means = chains.mean(axis=1)  # [M, d]
    vars_ = chains.var(axis=1, ddof=1)  # [M, d] (1/(N-1) like the reference)
    theta_hat = means.mean(axis=0)
    w = vars_.mean(axis=0)
    b = n / (m - 1) * ((means - theta_hat) ** 2).sum(axis=0)
    v = (n - 1) / n * w + (m + 1) / (m * n) * b
    return np.sqrt(v / w)


def _autocov(x):
    """FFT autocovariance of a 1-D series, biased (divided by N)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    xc = x - x.mean()
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, nfft)
    acov = np.fft.irfft(f * np.conj(f), nfft)[:n].real / n
    return acov


def ess(chains):
    """Effective sample size via Geyer's initial positive sequence, pooled
    across chains (the estimator behind az.ess's bulk method).
    chains: [N], [M, N], or [M, N, d] -> scalar or [d]."""
    a = np.asarray(chains, dtype=float)
    if a.ndim == 1:
        a = a[None, :]
    if a.ndim == 3:
        return np.asarray([ess(a[:, :, j]) for j in range(a.shape[2])])
    m, n = a.shape
    acovs = np.stack([_autocov(a[i]) for i in range(m)])  # [M, N]
    chain_var = acovs[:, 0].mean()
    if chain_var == 0:
        return float(m * n)
    mean_acov = acovs.mean(axis=0)
    # between-chain contribution (rank-normalized variants omitted; matches
    # the classic multi-chain estimator)
    w = mean_acov[0]
    var_plus = w * (n - 1) / n + a.mean(axis=1).var(ddof=1 if m > 1 else 0)
    rho = 1.0 - (w - mean_acov) / var_plus  # [N]
    # Geyer: sum consecutive pairs while positive & monotone
    tau = 1.0
    prev_pair = np.inf
    for t in range(1, n - 2, 2):
        pair = rho[t] + rho[t + 1]
        if pair < 0:
            break
        pair = min(pair, prev_pair)  # enforce monotone decrease
        tau += 2.0 * pair
        prev_pair = pair
    return float(m * n / tau)


def _split_chains(a):
    """[M, N] -> [2M, N//2]: first and last halves as separate chains (a
    within-chain trend then shows up as between-chain variance)."""
    m, n = a.shape
    half = n // 2
    return np.concatenate([a[:, :half], a[:, n - half :]], axis=0)


def _avg_ranks(flat):
    """Average-tie ranks (scipy.stats.rankdata(method="average") without
    the scipy dependency — MH chains repeat values on rejection, so ties
    dominate and midranks matter)."""
    order = np.argsort(flat, kind="stable")
    ordinal = np.empty(flat.size, dtype=float)
    ordinal[order] = np.arange(1, flat.size + 1)
    _, inverse, counts = np.unique(flat, return_inverse=True,
                                   return_counts=True)
    sums = np.zeros(counts.size)
    np.add.at(sums, inverse, ordinal)
    return sums[inverse] / counts[inverse]


def _rank_normalize(a):
    """Fractional-rank z-scores over the POOLED draws (Vehtari et al. 2021
    eq. 14): rank with average ties, then z = ndtri((r - 3/8) / (S + 1/4)).
    Shape-preserving.  Uses jax's ndtri so the package's declared
    dependencies (jax, numpy) cover the whole diagnostics path."""
    from jax.scipy.special import ndtri

    flat = np.asarray(a, dtype=float).reshape(-1)
    r = _avg_ranks(flat)
    z = np.asarray(ndtri((r - 0.375) / (flat.size + 0.25)))
    return z.reshape(np.shape(a))


def gelman_rubin_rank(chains):
    """Rank-normalized split-R-hat (Vehtari, Gelman, Simpson, Carpenter,
    Burkner 2021): split each chain in half, rank-normalize the pooled
    draws, then apply the classic R-hat formula.  Robust to heavy tails and
    detects within-chain trends the unsplit estimator misses.  The classic
    ``gelman_rubin`` stays as the reference-parity estimator (reference
    helpers.py:15-43).  chains: [M, N, d] -> [d]."""
    a = np.asarray(chains, dtype=float)
    if a.ndim == 2:
        a = a[..., None]
    out = []
    for j in range(a.shape[2]):
        s = _split_chains(a[:, :, j])
        if np.all(s == s.reshape(-1)[0]):
            out.append(1.0)  # constant chain: degenerate but not divergent
            continue
        z = _rank_normalize(s)
        out.append(float(gelman_rubin(z[..., None])[0]))
    return np.asarray(out)


def ess_rank(chains):
    """Rank-normalized bulk ESS (Vehtari et al. 2021): split chains, rank-
    normalize pooled draws, then the Geyer estimator.  Headline min-ESS
    claims use THIS estimator (the classic ``ess`` has high variance at
    small effective sizes and is kept for reference parity).
    chains: [N], [M, N], or [M, N, d] -> scalar or [d]."""
    a = np.asarray(chains, dtype=float)
    if a.ndim == 1:
        a = a[None, :]
    if a.ndim == 3:
        return np.asarray([ess_rank(a[:, :, j]) for j in range(a.shape[2])])
    s = _split_chains(a)
    if np.all(s == s.reshape(-1)[0]):
        return float(a.size)
    return float(ess(_rank_normalize(s)))


def running_mean(x, n):
    """Reference helpers.py:46-48."""
    x = np.asarray(x, dtype=float)
    c = np.cumsum(np.insert(x, 0, 0.0))
    return (c[n:] - c[:-n]) / float(n)


def posterior_mse(true_param, chain):
    """Reference helpers.py:51-54."""
    return float(np.mean((np.asarray(chain, dtype=float) - true_param) ** 2))


def acceptance_rate(thetas):
    """Fraction of unique rows — the reference's live acceptance measure
    (tests/test_pmcmc_noisy.py:240-241)."""
    th = np.asarray(thetas)
    return len(np.unique(th, axis=0)) / th.shape[0]


def burn_thin(samples, burn_in=100, thin=1):
    """Burn-in + thinning applied before analysis
    (reference tests/test_pmcmc_noisy.py:82-94)."""
    return np.asarray(samples)[burn_in::thin]


def pool_chains(chains, burn_in=0, thin=1):
    """Apply burn-in and thinning PER CHAIN, then flatten to a single
    [M * ceil((N - burn_in) / thin), d] sample matrix.  This is the correct
    way to pool parallel chains for a posterior summary — slicing the
    flattened chain-major array instead would discard only chain 0's burn-in
    while keeping every other chain's.  chains: [M, N, d] (or [N, d])."""
    a = np.asarray(chains)
    if a.ndim == 2:
        a = a[None]
    return a[:, burn_in::thin].reshape(-1, a.shape[-1])


def summarize_chain(thetas, names=None, prob=0.95):
    """Per-parameter mean / median / HDI table (the reference prints these at
    the end of every PMCMC script, e.g. tests/test_pmcmc_noisy.py:246-249)."""
    th = np.asarray(thetas, dtype=float)
    if th.ndim == 1:
        th = th[:, None]
    names = names or [f"theta_{j}" for j in range(th.shape[1])]
    rows = {}
    for j, name in enumerate(names):
        lo, hi = hdi(th[:, j], prob)
        rows[name] = {
            "mean": float(th[:, j].mean()),
            "median": float(np.median(th[:, j])),
            "hdi_lo": float(lo),
            "hdi_hi": float(hi),
        }
    return rows
