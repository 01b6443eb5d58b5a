from .surface import (
    high_likelihood_map,
    likelihood_surface,
    offline_rescreen,
    theta_grid,
)
from .stats import (
    acceptance_rate,
    burn_thin,
    ess,
    ess_rank,
    gelman_rubin,
    gelman_rubin_rank,
    hdi,
    mean_credible_interval,
    pool_chains,
    posterior_mse,
    running_mean,
    summarize_chain,
)

__all__ = [
    "high_likelihood_map",
    "likelihood_surface",
    "offline_rescreen",
    "theta_grid",
    "acceptance_rate",
    "burn_thin",
    "ess",
    "ess_rank",
    "gelman_rubin",
    "gelman_rubin_rank",
    "hdi",
    "mean_credible_interval",
    "pool_chains",
    "posterior_mse",
    "running_mean",
    "summarize_chain",
]
