"""SIR compartment model.

Reactions (reference gillespie_algo.py:37-46):
  infect :  S -> I   at rate  beta * S * I / N
  recover:  I -> R   at rate  gamma * I

theta = [beta, gamma].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from .base import make_model

S, I, R = 0, 1, 2


def _rates(x, theta):
    beta = theta[..., 0]
    gamma = theta[..., 1]
    n = jnp.sum(x, axis=-1)
    a_infect = beta * x[..., S] * x[..., I] / n
    a_recover = gamma * x[..., I]
    return jnp.stack([a_infect, a_recover], axis=-1)


def _init(key, n_particles, n_population=4820, mu=20.0):
    """Particle-cloud initial state: I0 ~ Poisson(mu), S0 = N - I0, R0 = 0
    (reference pmcmc.py:156-159)."""
    i0 = jax.random.poisson(key, mu, shape=(n_particles,)).astype(jnp.float32)
    s0 = jnp.asarray(n_population, jnp.float32) - i0
    r0 = jnp.zeros_like(i0)
    return jnp.stack([s0, i0, r0], axis=-1)


@lru_cache(maxsize=None)  # identity-stable: repeated calls hit the jit cache
def sir_model():
    return make_model(
        name="sir",
        compartments=("s", "i", "r"),
        stoich=np.array([[-1, 1, 0], [0, -1, 1]]),
        source=np.array([S, I]),
        rate_fn=_rates,
        theta_dim=2,
        theta_names=("beta", "gamma"),
        terminal_compartments=(I,),
        init_fn=_init,
    )
