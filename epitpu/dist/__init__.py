from .mesh import (
    CHAIN_AXIS,
    PARTICLE_AXIS,
    make_mesh,
    sharded_particle_filter,
    sharded_pmmh,
)

__all__ = [
    "CHAIN_AXIS",
    "PARTICLE_AXIS",
    "make_mesh",
    "sharded_particle_filter",
    "sharded_pmmh",
]
