"""Streaming (Welford) mean/covariance for adaptive random-walk proposals.

The reference recomputes ``np.cov`` over the whole chain prefix every
iteration once past 1,000 samples (reference pmcmc.py:327-328) — O(i*d^2)
per step and impossible inside a compiled scan.  A Welford accumulator gives
the identical ddof=0 covariance in O(d^2) per step and lives happily in the
scan carry.  With an axis name, statistics can additionally be pooled across
parallel chains via collectives (no reference counterpart — the reference
runs chains as separate script invocations, SURVEY.md section 2c).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Welford:
    count: jnp.ndarray  # scalar float
    mean: jnp.ndarray  # [d]
    m2: jnp.ndarray  # [d, d] sum of outer-product deviations

    @staticmethod
    def init(d, dtype=jnp.float32):
        return Welford(
            count=jnp.zeros((), dtype),
            mean=jnp.zeros((d,), dtype),
            m2=jnp.zeros((d, d), dtype),
        )

    def update(self, x):
        count = self.count + 1.0
        delta = x - self.mean
        mean = self.mean + delta / count
        delta2 = x - mean
        m2 = self.m2 + jnp.outer(delta, delta2)
        return Welford(count=count, mean=mean, m2=m2)

    def covariance(self, jitter=1e-4):
        """Population covariance (ddof=0, matching reference pmcmc.py:328)
        plus diagonal jitter."""
        d = self.mean.shape[0]
        safe = jnp.maximum(self.count, 1.0)
        cov = self.m2 / safe
        return cov + jitter * jnp.eye(d, dtype=cov.dtype)

    def pooled(self, axis_name):
        """Merge accumulators across a named (vmap/shard_map) chain axis —
        the parallel-chains generalization of adaptive covariance."""
        count = jax.lax.psum(self.count, axis_name)
        mean_w = jax.lax.psum(self.count * self.mean, axis_name) / jnp.maximum(
            count, 1.0
        )
        # combine within-chain m2 with between-chain dispersion
        delta = self.mean - mean_w
        m2 = jax.lax.psum(
            self.m2 + self.count * jnp.outer(delta, delta), axis_name
        )
        return Welford(count=count, mean=mean_w, m2=m2)
