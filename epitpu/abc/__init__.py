from .rejection import ABCResult, abc_rejection, reference_sir_distance

__all__ = ["ABCResult", "abc_rejection", "reference_sir_distance"]
