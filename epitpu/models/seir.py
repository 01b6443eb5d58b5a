"""SEIR compartment model.

Reactions (reference gillespie_algo.py:106-117):
  expose  :  S -> E   at rate  beta * S * I / N
  progress:  E -> I   at rate  alpha * E
  recover :  I -> R   at rate  gamma * I

theta = [beta, alpha, gamma].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from .base import make_model

S, E, I, R = 0, 1, 2, 3


def _rates(x, theta):
    beta = theta[..., 0]
    alpha = theta[..., 1]
    gamma = theta[..., 2]
    n = jnp.sum(x, axis=-1)
    a_expose = beta * x[..., S] * x[..., I] / n
    a_progress = alpha * x[..., E]
    a_recover = gamma * x[..., I]
    return jnp.stack([a_expose, a_progress, a_recover], axis=-1)


def _init(key, n_particles, n_population=4820, mu=20.0):
    """I0 ~ Poisson(mu), S0 = N - I0, E0 = R0 = 0 (reference pmcmc.py:160-164)."""
    i0 = jax.random.poisson(key, mu, shape=(n_particles,)).astype(jnp.float32)
    s0 = jnp.asarray(n_population, jnp.float32) - i0
    z = jnp.zeros_like(i0)
    return jnp.stack([s0, z, i0, z], axis=-1)


@lru_cache(maxsize=None)  # identity-stable: repeated calls hit the jit cache
def seir_model():
    return make_model(
        name="seir",
        compartments=("s", "e", "i", "r"),
        stoich=np.array(
            [[-1, 1, 0, 0], [0, -1, 1, 0], [0, 0, -1, 1]]
        ),
        source=np.array([S, E, I]),
        rate_fn=_rates,
        theta_dim=3,
        theta_names=("beta", "alpha", "gamma"),
        terminal_compartments=(E, I),
        init_fn=_init,
    )
