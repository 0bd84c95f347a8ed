"""Training-dataset generation by running the inference pipeline.

Rebuilds scripts/{rotate,blending,pp}_gen.py: the reference monkey-patches
pipeline stages (RaiseDownsample exception hack, pp_gen.py:31-50; identity
blend_images, blending_gen.py:16-51) to cut the pipeline early. Here the
cut points are explicit flags — `stop_after` selects which intermediate
tensors come back, no exceptions, still one jitted program per mode.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.models import encoders, stylegan2
from hairfastgan_tpu.ops.pallas_morphology import dilate_erode_auto as dilate_erode
from hairfastgan_tpu.pipeline.embedding import to_res
from hairfastgan_tpu.pipeline.alignment import align_images, shape_module
from hairfastgan_tpu.pipeline.embedding import embed_images

Array = jax.Array


def generate_blending_sample(
    zoo: Dict,
    face: Array,
    shape: Array,
    color: Array,
    cfg: HairFastConfig = HairFastConfig(),
    seg16_params: Optional[Dict] = None,
) -> Dict[str, Array]:
    """One Blending_dataset row (blending_gen.py:43-69 + blending_train.py
    :210-252): aligned S/F latents + images + masks, blend left untrained.

    With `seg16_params` (the seg.pth 16-class parser), HM_XD/HM_XE come from
    the rendered aligned image like the reference's Blending_dataset
    (:224-235 renders G[4..8](align latents) then generate_mask); otherwise
    the pipeline's 19-class target-hair mask is used.
    """
    stacked = jnp.concatenate([face, shape, color], axis=0)
    b = face.shape[0]
    emb = embed_images(zoo, stacked, mix=True, cfg=cfg)
    e_face = {k: v[:b] for k, v in emb.items()}
    e_shape = {k: v[b:2 * b] for k, v in emb.items()}
    e_color = {k: v[2 * b:] for k, v in emb.items()}

    align_shape = align_images(zoo, e_face, e_shape, same=False, cfg=cfg)
    align_color = shape_module(zoo, e_face, e_color, same=False, cfg=cfg)

    hair1 = (e_face["mask"] == cfg.hair_label).astype(face.dtype)[..., None]
    hair3 = (e_color["mask"] == cfg.hair_label).astype(face.dtype)[..., None]
    hm_1d, _ = dilate_erode(hair1, cfg.smooth)
    hm_3d, hm_3e = dilate_erode(hair3, cfg.smooth)
    if seg16_params is not None:
        _, i_align = stylegan2.synthesis(
            zoo["generator"], e_face["S"], start_layer=4, end_layer=8,
            layer_in=align_shape["latent_F_align"], cfg=cfg.stylegan)
        hm_xd, hm_xe = generate_mask16(seg16_params, i_align, cfg.smooth)
    else:
        hm_xd, hm_xe = dilate_erode(align_color["HM_X"], cfg.smooth)
    target_mask = (1 - hm_1d) * (1 - hm_3d) * (1 - hm_xd)

    return {
        "color_s": e_color["S"],
        "align_s": e_face["S"],
        "align_f": align_shape["latent_F_align"],
        "color_i": e_color["image_norm_256"],
        "face_i": e_face["image_norm_256"],
        "target_mask": target_mask,
        "HM_3E": hm_3e,
        "HM_XE": hm_xe,
    }


def generate_pp_sample(
    zoo: Dict,
    face: Array,
    shape: Array,
    color: Array,
    cfg: HairFastConfig = HairFastConfig(),
) -> Dict[str, Array]:
    """One PP_dataset row (pp_gen.py:86-118): the blended-but-unrefined
    render plus source image and masks."""
    blend = generate_blending_sample(zoo, face, shape, color, cfg)

    s_blend_6 = encoders.blending_model(
        zoo["blending"], blend["align_s"][:, 6:], blend["color_s"][:, 6:],
        blend["face_i"] * blend["target_mask"], blend["color_i"] * blend["HM_3E"])
    s_blend = jnp.concatenate([blend["align_s"][:, :6], s_blend_6], axis=1)
    _, i_blend = stylegan2.synthesis(zoo["generator"], s_blend, start_layer=4,
                                     end_layer=8, layer_in=blend["align_f"],
                                     cfg=cfg.stylegan)
    return {
        "source": blend["face_i"],
        "target": to_res(i_blend, 256),
        "target_mask": blend["target_mask"],
        "HT_E": blend["HM_XE"],
        # full-res source, normed: the adversarial discriminator's real
        # images (the reference feeds source_1024, pp_train.py:125,162)
        "source_full": face * 2.0 - 1.0,
    }


def generate_mask16(bisenet16_params, images_norm: Array,
                    smooth: int = 5) -> Tuple[Array, Array]:
    """(HM_XD, HM_XE) from the 16-class parser on [-1,1] images.

    Training-time mask generation (blending_train.py:66-75 generate_mask:
    parse the 512-downsampled render with seg.pth, hair = class 10,
    nearest-resize to 256, dilate/erode)."""
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.ops.resample import resize

    im512 = to_res((images_norm + 1.0) / 2.0, 512)
    logits = bisenet.bisenet_logits(bisenet16_params,
                                    bisenet.to_bisenet_input(im512))
    labels = jnp.argmax(logits, axis=-1)
    hair = (labels == bisenet.SEG16_HAIR).astype(images_norm.dtype)[..., None]
    hair256 = resize(hair, (256, 256), "nearest")
    return dilate_erode(hair256, smooth)


def generate_rotate_pair(
    zoo: Dict,
    img_a: Array,
    img_b: Array,
    cfg: HairFastConfig = HairFastConfig(),
) -> Dict[str, Array]:
    """Rotate training pair (rotate_gen.py): e4e W+ codes of both images +
    the 256 targets; keypoints are added by the keypoint extractor at train
    time."""
    stacked = jnp.concatenate([img_a, img_b], axis=0)
    b = img_a.shape[0]
    emb = embed_images(zoo, stacked, mix=False, cfg=cfg)
    return {
        "W_from": emb["W"][b:],
        "W_to": emb["W"][:b],
        "I_from": (emb["image_norm_256"][b:] + 1) / 2,
        "I_to": (emb["image_norm_256"][:b] + 1) / 2,
    }
