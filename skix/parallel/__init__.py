from skix.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_params_fsdp,
    shard_params_tp,
)
from skix.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    sequential_apply,
    shard_params_pipeline,
    stack_stage_params,
)
