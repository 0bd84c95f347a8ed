from hairfastgan_tpu.pipeline.swap import hair_fast, swap_cases  # noqa: F401
from hairfastgan_tpu.pipeline.embedding import embed_images  # noqa: F401
from hairfastgan_tpu.pipeline.alignment import align_images, shape_module  # noqa: F401
from hairfastgan_tpu.pipeline.blending import blend_images  # noqa: F401
