from hairfastgan_tpu.models import (  # noqa: F401
    bisenet,
    clip_vit,
    e4e,
    encoders,
    iresnet,
    sean,
    shape_adaptor,
    stylegan2,
)
