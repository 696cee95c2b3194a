from .mesh import (  # noqa: F401
    make_mesh, param_shardings, batch_sharding, replicate_sharding,
    shard_params, DATA_AXIS, MODEL_AXIS,
)
