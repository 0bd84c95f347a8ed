from hairfastgan_tpu.ops.basic import (  # noqa: F401
    adaptive_avg_pool,
    avg_pool_global,
    batch_norm,
    conv2d,
    conv2d_p,
    instance_norm,
    layer_norm,
    leaky_relu,
    linear,
    max_pool,
    prelu,
)
from hairfastgan_tpu.ops.resample import (  # noqa: F401
    bicubic_downsample_matrix,
    resize,
    resize_matrix,
)
from hairfastgan_tpu.ops.upfirdn2d import (  # noqa: F401
    blur2d,
    make_fir_kernel,
    upfirdn2d,
)
from hairfastgan_tpu.ops.fused_act import fused_leaky_relu  # noqa: F401
from hairfastgan_tpu.ops.equalized import (  # noqa: F401
    equal_conv2d,
    equal_linear,
    pixel_norm,
)
from hairfastgan_tpu.ops.modconv import modulated_conv2d  # noqa: F401
from hairfastgan_tpu.ops.morphology import dilate_erode  # noqa: F401
from hairfastgan_tpu.ops.segops import (  # noqa: F401
    one_hot_mask,
    region_broadcast,
    region_mean,
)
