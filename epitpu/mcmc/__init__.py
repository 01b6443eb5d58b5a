from .adaptive import Welford
from .pmmh import PMMHResult, particle_mcmc, particle_mcmc_chains, particle_mcmc_jit

__all__ = [
    "Welford",
    "PMMHResult",
    "particle_mcmc",
    "particle_mcmc_chains",
    "particle_mcmc_jit",
]
