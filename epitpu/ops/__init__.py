"""Pallas TPU kernels for the hot ops (used where they beat XLA)."""
from .tauleap_pallas import (
    pallas_advance_available,
    pallas_simulate,
    pallas_simulate_supported,
)

__all__ = [
    "pallas_advance_available",
    "pallas_simulate",
    "pallas_simulate_supported",
]
