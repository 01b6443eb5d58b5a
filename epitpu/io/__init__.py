from .artifacts import (
    load_dataset,
    load_pmmh_run,
    save_dataset,
    save_pmmh_run,
    warm_start,
)
from .checkpoint import ChainCheckpoint, load_checkpoint, save_checkpoint

__all__ = [
    "load_dataset",
    "load_pmmh_run",
    "save_dataset",
    "save_pmmh_run",
    "warm_start",
    "ChainCheckpoint",
    "load_checkpoint",
    "save_checkpoint",
]
