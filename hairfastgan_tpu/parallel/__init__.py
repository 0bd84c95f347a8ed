from hairfastgan_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    data_parallel,
    make_mesh,
    shard_batch,
    replicate,
    shard_params_model_axis,
)
