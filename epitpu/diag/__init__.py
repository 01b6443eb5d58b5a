from .stats import (
    acceptance_rate,
    burn_thin,
    ess,
    gelman_rubin,
    hdi,
    mean_credible_interval,
    pool_chains,
    posterior_mse,
    running_mean,
    summarize_chain,
)

__all__ = [
    "acceptance_rate",
    "burn_thin",
    "ess",
    "gelman_rubin",
    "hdi",
    "mean_credible_interval",
    "pool_chains",
    "posterior_mse",
    "running_mean",
    "summarize_chain",
]
