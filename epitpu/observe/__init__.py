from .models import (
    binom_logpmf,
    normal_logpdf,
    make_binomial_obs,
    make_gaussian_obs,
    get_observation_model,
)

__all__ = [
    "binom_logpmf",
    "normal_logpdf",
    "make_binomial_obs",
    "make_gaussian_obs",
    "get_observation_model",
]
