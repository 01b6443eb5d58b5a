from .mesh import (
    CHAIN_AXIS,
    PARTICLE_AXIS,
    make_mesh,
    sharded_particle_filter,
    sharded_pmmh,
)
from .multihost import (
    initialize_multihost,
    is_primary_host,
    multihost_env_spec,
)

__all__ = [
    "CHAIN_AXIS",
    "PARTICLE_AXIS",
    "make_mesh",
    "sharded_particle_filter",
    "sharded_pmmh",
    "initialize_multihost",
    "is_primary_host",
    "multihost_env_spec",
]
