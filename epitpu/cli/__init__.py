from .configs import (
    DataConfig,
    ExperimentConfig,
    MCMCConfig,
    noise_sweep,
    pobs_sweep,
    sweep,
    tmps_sweep,
)
from .run import PRESETS, build_model, generate_dataset, main, run_experiment

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "MCMCConfig",
    "noise_sweep",
    "pobs_sweep",
    "sweep",
    "tmps_sweep",
    "PRESETS",
    "build_model",
    "generate_dataset",
    "main",
    "run_experiment",
]
