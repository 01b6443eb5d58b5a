"""epitpu — TPU-native Bayesian inference for stochastic epidemic models.

A ground-up JAX/XLA redesign with the capabilities of
GeorgeEfstathiadis/Stochastic-Epidemic-Modelling: forward simulation
(exact SSA + tau-leap), ABC rejection, bootstrap particle filtering,
ancestral path sampling, PMMH with adaptive proposals, diagnostics, and a
config-driven experiment runner — vectorized over particles, vmapped over
chains, and sharded over device meshes.
"""

__version__ = "0.1.0"

from . import models, sim, ode, observe, smc, mcmc  # noqa: F401
