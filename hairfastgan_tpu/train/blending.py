"""Blending (color) encoder training — JAX port of scripts/blending_train.py.

Objective (blending_train.py:90-111): render the blended S through frozen
G[4..8] with the aligned F, then CLIP-cosine losses between the generated
256 image and (a) the face image inside the face mask, (b) the color image
inside the hair mask. The first 6 latent rows are ZEROS during training
(blending_train.py:109), unlike inference which keeps S_face[:6].

Batch layout mirrors Blending_dataset (:210-252):
  (color_s [B,18,512], align_s [B,18,512], align_f [B,32,32,512],
   color_i [B,256,256,3] norm, face_i [B,256,256,3] norm,
   target_mask, HM_3E, HM_XE  [B,256,256,1])
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.models import encoders, stylegan2
from hairfastgan_tpu.pipeline.embedding import to_res
from hairfastgan_tpu.train.common import adam_with_clip, make_train_step

Array = jax.Array


def _cosine_loss(a: Array, b: Array) -> Array:
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.mean(1.0 - jnp.sum(an * bn, axis=-1))


def blending_loss(
    model_params,
    frozen: Dict,
    batch: Tuple[Array, ...],
    cfg: HairFastConfig = HairFastConfig(),
) -> Tuple[Array, Dict[str, Array]]:
    color_s, align_s, align_f, color_i, face_i, target_mask, hm3e, hmxe = batch
    b = color_s.shape[0]

    params = dict(model_params, clip=frozen["clip"])
    blend_s = encoders.blending_model(params, align_s[:, 6:], color_s[:, 6:],
                                      face_i * target_mask, color_i * hm3e)
    latent_in = jnp.concatenate(
        [jnp.zeros((b, 6, 512), blend_s.dtype), blend_s], axis=1)
    _, i_g = stylegan2.synthesis(frozen["generator"], latent_in,
                                 start_layer=4, end_layer=8,
                                 layer_in=align_f, cfg=cfg.stylegan)
    i_g256 = to_res(i_g, 256)

    gen_face = encoders.clip_image_embed(frozen["clip"], i_g256 * target_mask)
    gt_face = encoders.clip_image_embed(frozen["clip"], face_i * target_mask)
    face_loss = _cosine_loss(gen_face, gt_face)

    # reference masks BOTH hair terms with HM_3E; the HM_XE slot is carried
    # in the dataset but unused by calc_loss (blending_train.py:90-99,115)
    del hmxe
    gen_hair = encoders.clip_image_embed(frozen["clip"], i_g256 * hm3e)
    gt_hair = encoders.clip_image_embed(frozen["clip"], color_i * hm3e)
    hair_loss = _cosine_loss(gen_hair, gt_hair)

    loss = face_loss + hair_loss
    return loss, {"face_loss": face_loss, "hair_loss": hair_loss}


def make_blending_train_step(frozen: Dict, cfg: HairFastConfig = HairFastConfig(),
                             lr: float = 1e-4):
    """Jitted DP train step; batch args sharded over the mesh data axis."""
    tx = adam_with_clip(lr)

    def loss_fn(params, frozen_arg, *batch):
        return blending_loss(params, frozen_arg, batch, cfg)

    # frozen rides as a call-time argument, not a closure (closure arrays
    # embed as HLO literals — see make_train_step)
    return make_train_step(loss_fn, tx, frozen=frozen), tx
