from vitparticlefiltertracker_tpu.parallel.mesh import (
    banked_state_sharding,
    make_mesh,
    replicated,
)

__all__ = ["make_mesh", "banked_state_sharding", "replicated"]
