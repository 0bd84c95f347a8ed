"""Final Poisson composite: restore the original photo outside the hair.

Reference: `poisson_image_blending` (utils/image_utils.py:58-94) — segment
the swap result and the original face photo, take the union of their hair
regions, dilate it 30 rounds, and seamless-clone the original photo back
into the result everywhere OUTSIDE that dilated hair mask. The reference
shells out to the `fpie` CLI (subprocess + PNG round-trip, taichi-gpu grid
solver); here the whole composite — two BiSeNet parses, the morphology and
the multigrid Poisson solve — is one jitted on-device program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models import bisenet
from hairfastgan_tpu.ops.morphology import dilate_erode
from hairfastgan_tpu.ops.poisson import poisson_blend_multigrid

Array = jax.Array


def hair_union_mask(zoo: Dict, final01: Array, face01: Array,
                    dilate_iters: int = 30) -> Array:
    """Dilated union of both images' hair regions, [B,H,W,1] in {0,1}.

    Matches image_utils.py:67-77: parse at native resolution
    (FaceParsing_tensor.parsing_img, my_parsing_util.py:73-87), hair label
    CELEBA_HAIR, `DilateErosion(30)` on the union.
    """
    lab_final = bisenet.parse_to_celeba(zoo["bisenet"], final01)
    lab_face = bisenet.parse_to_celeba(zoo["bisenet"], face01)
    hair = jnp.maximum(lab_final == bisenet.CELEBA_HAIR,
                       lab_face == bisenet.CELEBA_HAIR)
    hair = hair[..., None].astype(final01.dtype)
    dilated, _ = dilate_erode(hair, iterations=dilate_iters)
    return dilated


def poisson_composite(zoo: Dict, final01: Array, face01: Array, *,
                      dilate_iters: int = 30, n_iters: int = 115,
                      levels: int = 4) -> Array:
    """Seamless-clone `face01` into `final01` outside the dilated hair union.

    `n_iters=115` mirrors the reference's fpie `maxn=115` grid iterations
    (image_utils.py:58); the multigrid pyramid gives the same long-range
    boundary propagation in far fewer fine-level sweeps. Returns [B,H,W,3]
    in [0,1].
    """
    hair = hair_union_mask(zoo, final01, face01, dilate_iters=dilate_iters)
    clone_region = 1.0 - hair  # mask_save = 1 - dilation (image_utils.py:77)
    return poisson_blend_multigrid(face01, final01, clone_region,
                                   n_iters=n_iters, levels=levels)
