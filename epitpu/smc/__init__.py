from .filter import FilterResult, particle_filter, particle_filter_jit
from .paths import sample_path
from .tune import tune_particles
from .resample import (
    get_resampler,
    multinomial_resample,
    normalized_weights,
    systematic_resample,
    systematic_resample_scatter,
)

__all__ = [
    "FilterResult",
    "particle_filter",
    "particle_filter_jit",
    "sample_path",
    "tune_particles",
    "get_resampler",
    "multinomial_resample",
    "normalized_weights",
    "systematic_resample",
    "systematic_resample_scatter",
]
