"""Blending + PostProcess stage: hair color transfer and refinement.

Rebuilds reference models/Blending.py:35-81 as a pure function:
  * dilate/erode hair masks of face & color (hair_from_mask,
    utils/image_utils.py:36-40) and of the target hair mask
  * target face region = (1-HM1D)(1-HM3D)(1-HMXD)
  * ClipBlendingModel(S1[:,6:], S3[:,6:], I1*mask, I3*HM3E) -> S_blend[6:]
    (skipped when face==shape==color; static `same_color` flag replaces the
    reference's `I_1 is not I_3 or I_1 is not I_2` identity check)
  * I_blend = G[4..8](S_blend, layer_in=F_align); downsample to 256
  * PostProcessModel(I_1_norm, I_blend_256_norm... see note) -> S_final,
    F_final; I_final = G[5..8](S_final, layer_in=F_final)

Note: the reference passes `I_blend_256 = downsample(I_blend)` (still in
[-1,1] generator range) and I_1 (norm-256) to PostProcessModel — both are
[-1,1]-scaled; we keep that convention.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.models import encoders, stylegan2
from hairfastgan_tpu.ops.pallas_morphology import dilate_erode_auto as dilate_erode
from hairfastgan_tpu.pipeline.embedding import to_res

Array = jax.Array


@jax.named_scope("blend")
def blend_images(
    zoo: Dict,
    align_shape: Dict[str, Array],
    align_color: Dict[str, Array],
    embed_face: Dict[str, Array],
    embed_color: Dict[str, Array],
    *,
    all_same: bool = False,
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
    noise_key: Optional[Array] = None,
    return_intermediate: bool = False,
    sp=None,
):
    """-> final image [B,1024,1024,3] in [0,1] (Blending.py:35-81).

    With `sp` (parallel/spatial.SpatialPlan, inside a shard_map) the two
    generator renders H-band their ≥from_res pairs over the mesh axis:
    I_blend gathers (PostProcess consumes the full image), the final render
    stays BANDED — the returned image is this device's rows and the
    caller's out_specs assemble it (zero ICI bytes for the output render).
    """
    i_1 = embed_face["image_norm_256"].astype(dtype)
    i_3 = embed_color["image_norm_256"].astype(dtype)

    hair1 = (embed_face["mask"] == cfg.hair_label).astype(dtype)[..., None]
    hair3 = (embed_color["mask"] == cfg.hair_label).astype(dtype)[..., None]
    hm_1d, _ = dilate_erode(hair1, cfg.smooth)
    hm_3d, hm_3e = dilate_erode(hair3, cfg.smooth)

    latent_s_1 = embed_face["S"].astype(dtype)
    latent_f_align = align_shape["latent_F_align"].astype(dtype)
    hm_x = align_color["HM_X"].astype(dtype)
    hm_xd, _ = dilate_erode(hm_x, cfg.smooth)

    target_mask = (1.0 - hm_1d) * (1.0 - hm_3d) * (1.0 - hm_xd)

    if all_same:
        s_blend = latent_s_1
    else:
        latent_s_3 = embed_color["S"].astype(dtype)
        s_blend_6_18 = encoders.blending_model(
            zoo["blending"], latent_s_1[:, 6:], latent_s_3[:, 6:],
            i_1 * target_mask, i_3 * hm_3e)
        s_blend = jnp.concatenate([latent_s_1[:, :6], s_blend_6_18], axis=1)

    if sp is not None:
        from hairfastgan_tpu.parallel.spatial import sharded_synthesis

        i_blend = sharded_synthesis(
            sp, zoo["generator"], s_blend, start_layer=4, end_layer=8,
            layer_in=latent_f_align, cfg=cfg.stylegan, dtype=dtype,
            gather=True)
    else:
        _, i_blend = stylegan2.synthesis(
            zoo["generator"], s_blend, start_layer=4, end_layer=8,
            layer_in=latent_f_align, cfg=cfg.stylegan, dtype=dtype,
            noise_key=noise_key)
    i_blend_256 = to_res(i_blend, 256)

    s_final, f_final = encoders.post_process_model(zoo["post_process"], i_1, i_blend_256)
    if sp is not None:
        i_final = sharded_synthesis(
            sp, zoo["generator"], s_final, start_layer=5, end_layer=8,
            layer_in=f_final, cfg=cfg.stylegan, dtype=dtype, gather=False)
    else:
        _, i_final = stylegan2.synthesis(
            zoo["generator"], s_final, start_layer=5, end_layer=8,
            layer_in=f_final, cfg=cfg.stylegan, dtype=dtype,
            noise_key=noise_key)

    final = jnp.clip((i_final + 1.0) / 2.0, 0.0, 1.0)
    if return_intermediate:
        return final, {"I_blend": i_blend, "S_blend": s_blend,
                       "S_final": s_final, "F_final": f_final}
    return final
