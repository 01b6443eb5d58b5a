"""Pallas TPU kernels for the hot ops (used where they beat XLA)."""
from .tauleap_pallas import pallas_advance, pallas_advance_available

__all__ = ["pallas_advance", "pallas_advance_available"]
