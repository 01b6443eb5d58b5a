from .adaptive import Welford
from .forecast import forecast_from_result, posterior_forecast
from .pmmh import (
    PMMHResult,
    PMMHState,
    particle_mcmc,
    particle_mcmc_chains,
    particle_mcmc_jit,
)

__all__ = [
    "Welford",
    "PMMHResult",
    "PMMHState",
    "particle_mcmc",
    "particle_mcmc_chains",
    "particle_mcmc_jit",
    "posterior_forecast",
    "forecast_from_result",
]
