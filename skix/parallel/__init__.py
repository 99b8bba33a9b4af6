from skix.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_params_fsdp,
    shard_params_tp,
)
