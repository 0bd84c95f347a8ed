"""Alignment stage: pose rotation + target hair shape + F-space blending.

Rebuilds reference models/Alignment.py:43-181 as pure functions:

shape_module (:43-103):
  * RotateModel on W2[:, :6] conditioned on W1[:, :6] -> full G render of
    the rotated shape image -> BiSeNet re-segmentation (at 1024, labels
    nearest-resized to 256)
  * CtrlHair shape adaptor: face code of mask1 + hair code of the rotated
    mask2 -> recombined 256^2 target mask
  * hair masks = (labels == 13)

align_images (:105-181):
  * SEAN: encode both 256 images under their masks; decode each code set
    under the target mask (inpainting)
  * re-embed both SEAN outputs through e4e -> (F, W) of inpainted images
  * F blending: three soft-mask lerps at 32x32 using dilate/erode masks

The `same` flag replaces the reference's `img1_in is img2_in` object
identity fast path with a static compile-time specialization.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.models import bisenet, encoders, sean, shape_adaptor, stylegan2
from hairfastgan_tpu.ops.pallas_morphology import dilate_erode_auto as dilate_erode
from hairfastgan_tpu.ops.resample import resize
from hairfastgan_tpu.pipeline.embedding import e4e_embed, to_res

Array = jax.Array


def _hair_mask(labels: Array, hair_label: int, dtype) -> Array:
    """[B,256,256] int -> [B,256,256,1] float hair mask."""
    return (labels == hair_label).astype(dtype)[..., None]


def _rotate_and_segment(zoo, w2: Array, w1_6: Array, *, cfg, dtype,
                        noise_key, sp=None) -> Array:
    """RotateModel -> G render -> BiSeNet 256 labels of the rotated image.

    The single home of the rotate-render contract shared by shape_module
    and shape_module_pair: the render is consumed ONLY by the
    re-segmentation, so cfg.rot_render_pairs (stop the synthesis at a lower
    pair) and cfg.rot_seg_size (parse at reduced res) apply here. Defaults =
    reference behavior: full render (Alignment.py:63), parse at full res
    (Alignment.py:65-67). `sp` H-bands the ≥from_res pairs over the mesh
    axis and all-gathers the image for the (non-local) re-segmentation
    (parallel/spatial.py).
    """
    rot6 = encoders.rotate_model(zoo["rotate"], w2[:, :6].astype(dtype),
                                 w1_6.astype(dtype))
    rotate_to = jnp.concatenate([rot6, w2[:, 6:].astype(dtype)], axis=1)
    end_pair = (cfg.rot_render_pairs if cfg.rot_render_pairs is not None
                else cfg.stylegan.log_size - 2)
    if sp is not None:
        from hairfastgan_tpu.parallel.spatial import sharded_synthesis

        i_rot = sharded_synthesis(sp, zoo["generator"], rotate_to,
                                  end_layer=end_pair, cfg=cfg.stylegan,
                                  dtype=dtype, gather=True)
    else:
        _, i_rot = stylegan2.synthesis(zoo["generator"], rotate_to,
                                       end_layer=end_pair,
                                       cfg=cfg.stylegan, dtype=dtype,
                                       noise_key=noise_key)
    i_rot01 = jnp.clip((i_rot + 1.0) / 2.0, 0.0, 1.0)
    if i_rot01.shape[1] > cfg.rot_seg_size:
        i_rot01 = to_res(i_rot01, cfg.rot_seg_size)
    return bisenet.segment_256(zoo["bisenet"], i_rot01)


@jax.named_scope("shape_module")
def shape_module(
    zoo: Dict,
    embed1: Dict[str, Array],
    embed2: Dict[str, Array],
    *,
    same: bool = False,
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
    noise_key: Optional[Array] = None,
    sp=None,
) -> Dict[str, Array]:
    """Target-mask prediction for the (face=1, other=2) pair.

    Returns dict with target_mask [B,256,256] and hair masks; the reference
    returns only HM_X when only_target — callers here just read what they
    need.
    """
    mask1, mask2 = embed1["mask"], embed2["mask"]

    if same:
        target_mask = mask1
        rot_mask = mask2
    else:
        rot_mask = _rotate_and_segment(
            zoo, embed2["W"], embed1["W"][:, :6], cfg=cfg, dtype=dtype,
            noise_key=noise_key, sp=sp)

        # only the face code of mask1 and the hair code of the rotated mask
        # are consumed; the reference encodes both codes for both masks and
        # discards half (Alignment.py:74-77)
        face_1 = shape_adaptor.get_face_code(zoo["shape_adaptor"], mask1)
        hair_2 = shape_adaptor.get_hair_code(zoo["shape_adaptor"], rot_mask)
        target_mask = shape_adaptor.get_new_shape(zoo["shape_adaptor"], face_1, hair_2)

    return {
        "target_mask": target_mask,
        "HM_X": _hair_mask(target_mask, cfg.hair_label, dtype),
        "hair_mask1": _hair_mask(mask1, cfg.hair_label, dtype),
        "hair_mask2": _hair_mask(mask2, cfg.hair_label, dtype),
        "rot_mask": rot_mask,
    }


@jax.named_scope("shape_module_pair")
def shape_module_pair(
    zoo: Dict,
    e_face: Dict[str, Array],
    e_shape: Dict[str, Array],
    e_color: Dict[str, Array],
    *,
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
    noise_key: Optional[Array] = None,
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Both of a swap's shape modules — (face,shape) and (face,color) — as
    ONE B=2b batch (hair_swap.py:49-57 runs them sequentially).

    Rotation, the full G render, BiSeNet re-segmentation, hair coding and
    hair decoding are genuinely different per pair and run batched; the
    face-mask path (face encoder + face decoder) depends only on `e_face`
    and runs once at B=b. Returns (sm_shape, sm_color) shaped exactly like
    two separate `shape_module(..., same=False)` results. EXACT vs the
    sequential path at the default zero noise; with a `noise_key` both
    paths draw fresh per-pixel gaussians but elementwise outputs differ
    (one [2b,...] draw vs two [b,...] draws cannot match bitwise).
    """
    mask1 = e_face["mask"]
    b = mask1.shape[0]
    w2 = jnp.concatenate([e_shape["W"], e_color["W"]], axis=0)
    rot_mask = _rotate_and_segment(
        zoo, w2, jnp.tile(e_face["W"][:, :6], (2, 1, 1)), cfg=cfg,
        dtype=dtype, noise_key=noise_key)

    face_1 = shape_adaptor.get_face_code(zoo["shape_adaptor"], mask1)
    hair_2 = shape_adaptor.get_hair_code(zoo["shape_adaptor"], rot_mask)
    target_mask = shape_adaptor.get_new_shape_shared_face(
        zoo["shape_adaptor"], face_1, hair_2)

    hm1 = _hair_mask(mask1, cfg.hair_label, dtype)
    out = []
    for i, e2 in enumerate((e_shape, e_color)):
        sl = slice(i * b, (i + 1) * b)
        out.append({
            "target_mask": target_mask[sl],
            "HM_X": _hair_mask(target_mask[sl], cfg.hair_label, dtype),
            "hair_mask1": hm1,
            "hair_mask2": _hair_mask(e2["mask"], cfg.hair_label, dtype),
            "rot_mask": rot_mask[sl],
        })
    return out[0], out[1]


@jax.named_scope("align")
def align_images(
    zoo: Dict,
    embed1: Dict[str, Array],
    embed2: Dict[str, Array],
    *,
    same: bool = False,
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
    noise_key: Optional[Array] = None,
    sm: Optional[Dict[str, Array]] = None,
    sp=None,
) -> Dict[str, Array]:
    """F-space alignment of (face, shape). Returns latent_F_align + HM_X.

    `sm` supplies a precomputed shape-module result (shape_module_pair);
    otherwise the module runs here (Alignment.py:120).
    """
    if sm is None:
        sm = shape_module(zoo, embed1, embed2, same=same, cfg=cfg, dtype=dtype,
                          noise_key=noise_key, sp=sp)
    if same:
        return {"latent_F_align": embed1["F"], "HM_X": sm["HM_X"]}

    target_mask = sm["target_mask"]

    # SEAN inpainting: encode both images, decode both under the target mask
    images = jnp.concatenate([embed1["image_256"], embed2["image_256"]], axis=0)
    labels = jnp.concatenate([embed1["mask"], embed2["mask"]], axis=0)
    codes = sean.sean_encode(zoo["sean"], images.astype(dtype), labels)
    tm2 = jnp.concatenate([target_mask, target_mask], axis=0)
    gens = sean.sean_decode(zoo["sean"], codes, tm2, noise_key=noise_key)

    # e4e re-embedding of the two inpainted images (Alignment.py:134-136)
    enc = e4e_embed(zoo, gens, cfg=cfg, dtype=dtype)
    b = embed1["F"].shape[0]
    intermediate_align, latent_F_out_new = enc["F"][:b], enc["F"][b:]

    # soft-mask F blending (Alignment.py:139-159)
    hm1, hm2, hmx = sm["hair_mask1"], sm["hair_mask2"], sm["HM_X"]
    masks = jnp.concatenate([
        1.0 - (1.0 - hm1) * (1.0 - hmx),
        hmx,
        hm2 * hmx,
    ], axis=0)
    dil, ero = dilate_erode(masks, cfg.smooth)
    free_mask = jnp.concatenate([dil[:b], ero[b:2 * b], ero[2 * b:]], axis=0)
    low = 1.0 - resize(free_mask, (32, 32), "bicubic")
    low0, low1, low2 = low[:b], low[b:2 * b], low[2 * b:]

    f_align = intermediate_align + low0 * (embed1["F"] - intermediate_align)
    f_align = latent_F_out_new + low1 * (f_align - latent_F_out_new)
    f_align = embed2["F"] + low2 * (f_align - embed2["F"])

    return {"latent_F_align": f_align, "HM_X": sm["HM_X"]}
