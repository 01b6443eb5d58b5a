"""Observation models as vectorized log-likelihood functions.

The reference computes particle weights in *linear* space as the MINIMUM over
observed compartments of per-compartment pmf/pdf values
(reference pmcmc.py:179-181) — min, not product — and later papers over the
resulting underflow with a string-parsed ``10**constant`` rescale
(reference pmcmc.py:376-379).  Here everything is log-space from the start:
weights are log-weights, the min-over-compartments becomes a min of logs
(a monotone map, so identical semantics), and no rescaling is ever needed.

``combine="min"`` reproduces the reference exactly; ``combine="sum"`` gives
the statistically standard product-of-likelihoods variant behind a flag.

An observation model is a callable ``log_weight(y, x_obs, param) -> logw``
with ``y: [obs_dim]`` one observation row, ``x_obs: [..., obs_dim]`` the
(already ``observe_map``-ped) latent states, and ``param`` a traced scalar —
traced so the reporting probability can itself be a per-chain inferred
parameter (reference pmcmc.py:283-287, 339-343).
"""
from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -jnp.inf
_HALF_LOG_2PI = 0.9189385332046727


def _stirling_delta(x):
    """Stirling-series correction delta(x) = lgamma(x) - (x-1/2)ln x + x -
    ln sqrt(2 pi), three terms — good to ~1e-8 for x >= 1."""
    inv = 1.0 / x
    inv2 = inv * inv
    return inv * (1.0 / 12.0 - inv2 * (1.0 / 360.0 - inv2 / 1260.0))


def _bd0(x, m):
    """Binomial deviance term ``bd0(x, m) = x log(x/m) + m - x`` computed
    stably (Loader 2000, the scheme behind R/scipy's dbinom): when x is
    close to m the direct form multiplies a large x by a log of a
    near-one ratio — in float32 that costs ~0.1 absolute at x ~ 10^5
    (population-10^6 observations) — so the near branch sums the series
    ``(x-m)v + 2x sum_j v^(2j+1)/(2j+1)`` in ``v = (x-m)/(x+m)``, whose
    terms are all O(deviance).  |v| <= 0.1/2.1 in the near branch, so 8
    terms reach float32 round-off."""
    v = (x - m) / (x + m)
    v2 = v * v
    acc = (x - m) * v
    ej = 2.0 * x * v
    for j in range(1, 8):
        ej = ej * v2
        acc = acc + ej / (2 * j + 1)
    direct = x * jnp.log(x / m) + m - x
    return jnp.where(jnp.abs(x - m) <= 0.1 * (x + m), acc, direct)


def binom_logpmf(k, n, p):
    """log Binomial(k | n, p) with scipy conventions: 0 probability (=-inf)
    outside the support 0 <= k <= n (reference weights use scipy
    ``binom.pmf``, pmcmc.py:179).

    Uses Loader's saddle-point form (the same scheme scipy's C impl uses):
    the log-pmf is a Stirling correction plus the binomial deviance
    ``-bd0(k, np) - bd0(n-k, n(1-p))``, which never subtracts large
    near-equal terms — the naive gammaln expression loses ~0.05 absolute
    in float32 already at n ~ 400, enough to corrupt particle weights, and
    the expanded ``-k*log(k/(np))`` form loses ~0.1 at n ~ 10^6 (the
    large-population regime, tests/test_large_regime.py pins < 0.005
    there against the float64/scipy oracle).
    """
    p = jnp.clip(p, 0.0, 1.0)
    ps = jnp.clip(p, 1e-10, 1.0 - 1e-7)  # guarded for interior formula
    # interior 1 <= k <= n-1 (safe-guarded operands)
    kk = jnp.clip(k, 1.0)
    nk = jnp.clip(n - k, 1.0)
    interior = (
        _stirling_delta(n) - _stirling_delta(kk) - _stirling_delta(nk)
        + 0.5 * jnp.log(n / (2.0 * jnp.pi * kk * nk))
        - _bd0(kk, n * ps)
        - _bd0(nk, n * (1.0 - ps))
    )
    # edges: k = 0 -> n log(1-p);  k = n -> n log p
    raw = jnp.where(k == 0, n * jnp.log1p(-ps), interior)
    raw = jnp.where(k == n, n * jnp.log(ps), raw)
    raw = jnp.where(n == 0, jnp.where(k == 0, 0.0, _NEG_INF), raw)
    # exact endpoints: p=0 -> pmf = 1{k=0}; p=1 -> pmf = 1{k=n}
    raw = jnp.where(p == 0.0, jnp.where(k == 0, 0.0, _NEG_INF), raw)
    raw = jnp.where(p == 1.0, jnp.where(k == n, 0.0, _NEG_INF), raw)
    support = (k >= 0) & (k <= n)
    return jnp.where(support, raw, _NEG_INF)


def normal_logpdf(y, loc, scale):
    z = (y - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi)


def _combine(logs, mode):
    if mode == "min":
        return jnp.min(logs, axis=-1)
    if mode == "sum":
        return jnp.sum(logs, axis=-1)
    raise ValueError(f"unknown combine mode {mode!r}")


def make_binomial_obs(combine="min"):
    """Under-reported counts: Y[c] ~ Binomial(X[c], p) per observed
    compartment (reference pmcmc.py:179)."""

    def log_weight(y, x_obs, p):
        logs = binom_logpmf(y, x_obs, p)  # [..., obs_dim]
        return _combine(logs, combine)

    return log_weight


def make_gaussian_obs(combine="min", eps=1e-4):
    """Noisy counts: Y[c] ~ Normal(X[c], noise * X[c] + eps)
    (reference pmcmc.py:181, selected with ``observations=True``)."""

    def log_weight(y, x_obs, noise):
        scale = noise * x_obs + eps
        logs = normal_logpdf(y, x_obs, scale)
        return _combine(logs, combine)

    return log_weight


def get_observation_model(kind, combine="min"):
    """kind: "binomial" (reference observations=False) or "gaussian"
    (reference observations=True)."""
    if kind == "binomial":
        return make_binomial_obs(combine)
    if kind == "gaussian":
        return make_gaussian_obs(combine)
    raise ValueError(f"unknown observation model {kind!r}")
