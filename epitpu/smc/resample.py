"""Particle resampling kernels (log-weight in, ancestor indices out).

The reference resamples multinomially via ``np.random.choice`` on normalized
linear weights and aborts the whole filter on a ValueError when the weights
are NaN/degenerate (reference pmcmc.py:185-193).  Here:

  * weights stay in log space and are normalized with logsumexp;
  * "multinomial" reproduces the reference's scheme (N iid categorical draws)
    via inverse-CDF search — NOT ``jax.random.categorical``, whose Gumbel
    trick would burn N^2 random numbers per step;
  * "systematic" (default) is the lower-variance stratified scheme: a single
    uniform offset + N equally spaced points through the CDF;
  * degeneracy never aborts: a degenerate step yields identity ancestry and a
    flag; the caller propagates -inf log-likelihood so PMMH rejects the
    proposal, matching the reference's reject-on-failure semantics
    (reference pmcmc.py:365-369).

Everything is shape-static and vmap/shard-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def normalized_weights(logw):
    """Returns (weights [N], log_sum, degenerate).  Degenerate means no
    particle has finite weight; weights then fall back to uniform so
    downstream code stays NaN-free."""
    lse = logsumexp(logw, axis=-1)
    degenerate = ~jnp.isfinite(lse)
    w = jnp.exp(logw - jnp.where(degenerate, 0.0, lse)[..., None])
    n = logw.shape[-1]
    w = jnp.where(degenerate[..., None], jnp.ones_like(w) / n, w)
    return w, lse, degenerate


def _inverse_cdf(w, points):
    """Map uniform points through the weight CDF.  Supports arbitrary leading
    batch dims (jnp.searchsorted itself is 1-D only; batch via vmap)."""
    cdf = jnp.cumsum(w, axis=-1)
    # guard against cumsum rounding below 1.0
    cdf = cdf / cdf[..., -1:]

    def search(c, pts):
        return jnp.searchsorted(c, pts, side="left")

    if w.ndim == 1:
        idx = search(cdf, points)
    else:
        batch = cdf.shape[:-1]
        flat_c = cdf.reshape((-1, cdf.shape[-1]))
        flat_p = points.reshape((-1, points.shape[-1]))
        idx = jax.vmap(search)(flat_c, flat_p).reshape(batch + (points.shape[-1],))
    return jnp.clip(idx, 0, w.shape[-1] - 1).astype(jnp.int32)


def systematic_resample(key, logw):
    """Systematic resampling: points u/N + i/N for one u ~ U[0,1)."""
    n = logw.shape[-1]
    w, _, degenerate = normalized_weights(logw)
    u = jax.random.uniform(key, shape=logw.shape[:-1] + (1,))
    points = (jnp.arange(n) + u) / n
    idx = _inverse_cdf(w, points)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), idx.shape)
    return jnp.where(degenerate[..., None], iota, idx), degenerate


def multinomial_resample(key, logw):
    """N iid categorical draws — the reference's ``np.random.choice``
    (reference pmcmc.py:188-190) — via per-draw inverse-CDF lookup."""
    n = logw.shape[-1]
    w, _, degenerate = normalized_weights(logw)
    u = jax.random.uniform(key, shape=logw.shape[:-1] + (n,))
    idx = _inverse_cdf(w, u)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), idx.shape)
    return jnp.where(degenerate[..., None], iota, idx), degenerate


_RESAMPLERS = {
    "systematic": systematic_resample,
    "multinomial": multinomial_resample,
}


def get_resampler(kind):
    try:
        return _RESAMPLERS[kind]
    except KeyError:
        raise ValueError(
            f"unknown resampling kind {kind!r}; options: {sorted(_RESAMPLERS)}"
        ) from None
