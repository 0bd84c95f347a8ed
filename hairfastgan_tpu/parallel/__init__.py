from hairfastgan_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    data_mesh_for_batch,
    data_parallel,
    make_mesh,
    shard_batch,
    replicate,
    shard_params_model_axis,
)
from hairfastgan_tpu.parallel.spatial import (  # noqa: F401
    SpatialPlan,
    make_sharded_swap,
    sharded_synthesis,
)
