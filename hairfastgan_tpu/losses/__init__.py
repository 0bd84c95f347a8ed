from hairfastgan_tpu.losses.perceptual import (  # noqa: F401
    init_lpips_alex,
    lpips,
    lpips_scale,
    convert_lpips_alex,
)
from hairfastgan_tpu.losses.identity import init_irse_backbone, irse_embed, id_loss  # noqa: F401
from hairfastgan_tpu.losses.objectives import (  # noqa: F401
    adv_d_loss,
    adv_g_loss,
    dice_loss,
    dilated_mask,
    feat_recon_loss,
    r1_penalty,
)
