from .mesh import (
    make_mesh,
    batch_sharding,
    stacked_batch_sharding,
    replicated,
    param_shardings,
)
