from .base import CompartmentModel, make_model
from .sir import sir_model
from .seir import seir_model
from .subgroups import sir_subgroups_model

__all__ = [
    "CompartmentModel",
    "make_model",
    "sir_model",
    "seir_model",
    "sir_subgroups_model",
]
