from .artifacts import (
    load_dataset,
    load_pmmh_run,
    save_dataset,
    save_pmmh_run,
    warm_start,
)
from .checkpoint import (
    ChainCheckpoint,
    PMMHCheckpoint,
    load_checkpoint,
    load_pmmh_checkpoint,
    save_checkpoint,
    save_pmmh_checkpoint,
)

__all__ = [
    "load_dataset",
    "load_pmmh_run",
    "save_dataset",
    "save_pmmh_run",
    "warm_start",
    "ChainCheckpoint",
    "PMMHCheckpoint",
    "load_checkpoint",
    "load_pmmh_checkpoint",
    "save_checkpoint",
    "save_pmmh_checkpoint",
]
