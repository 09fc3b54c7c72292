from floodsr_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_sharding_rules",
]
