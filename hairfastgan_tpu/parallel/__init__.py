from hairfastgan_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    make_mesh,
    shard_batch,
    replicate,
    shard_params_model_axis,
)
