"""Embedding stage: images -> {W, F, S, mask, image_256, image_norm_256}.

Rebuilds reference models/Embedding.py:56-118 as one pure batched function:
  * BicubicDownSample 1024 -> 512 / 256 (utils/bicubic.py)
  * e4e W+ from the normalized 256 image (+ latent_avg)
  * FSE S + 16x16 content from the normalized image bilinearly halved to
    256 (FSE downscales internally, trainer.py:61-64,268-271), S + latent_avg
  * F = G[3..3](S, layer_in=content) -> [B,32,32,512]
  * BiSeNet-19 parse of the 512 image -> 256 labels (Net.py:108-115)
  * W-space hair mixing: F += mixing * hairmask32 * (G[0..3](W) - F)
    (Embedding.py:85-92), applied unless all three inputs are identical

The reference loops a DataLoader over <=3 deduped images; here the three
pipeline images are one [3, H, W, C] device batch — every encoder runs once,
batched (the dedup fast paths become static `case` flags in swap.py).

Noise semantics: the reference draws fresh gaussian noise inside every
generator slice at inference (model.py:288-293 under seed 3407). Default
here is deterministic zero noise; pass noise_key for the stochastic
behavior (SURVEY.md §7 randomness note).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.models import bisenet, e4e, iresnet, stylegan2
from hairfastgan_tpu.ops.resample import bicubic_downsample, resize

Array = jax.Array


def to_res(img: Array, out: int) -> Array:
    """Resize to the fixed working resolution (256/512 spaces).

    The pipeline's mask/SEAN/shape-adaptor space is ALWAYS 256 and the
    parser input 512 (quarter/half of the reference's 1024); generator size
    only changes the synthesis resolution. Integer downscales use the
    PULSE bicubic FIR (reference utils/bicubic.py); other ratios (tiny test
    configs) fall back to bicubic resize.
    """
    if img.shape[1] == out:
        return img
    if img.shape[1] % out == 0:
        return bicubic_downsample(img, img.shape[1] // out)
    return resize(img, (out, out), "bicubic")


def fse_downscale(img_norm: Array, out_size: int = 256) -> Array:
    """Iterated x0.5 bilinear (FSE trainer.py:61-64), not a windowed resize.

    The FSE trunk's content geometry is fixed at 256 input (16x16x512 tap);
    sub-256 inputs (tiny test configs) are upsampled to preserve it.
    """
    x = img_norm
    while x.shape[1] > out_size:
        x = resize(x, (x.shape[1] // 2, x.shape[2] // 2), "bilinear")
    if x.shape[1] < out_size:
        x = resize(x, (out_size, out_size), "bilinear")
    return x


@jax.named_scope("embed")
def embed_images(
    zoo: Dict,
    images: Array,
    *,
    mix: bool = True,
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
) -> Dict[str, Array]:
    """images: [B,1024,1024,3] in [0,1] -> embedding dict (batched).

    zoo keys used: generator, e4e, fse, fse_latent_avg, bisenet.

    uint8 input is normalized ON DEVICE (images cross the host link at 1/4
    the bytes — the reference's ImagesDataset does the same uint8 -> /255,
    datasets/image_dataset.py:14-16).
    """
    if images.dtype == jnp.uint8:
        img = images.astype(dtype) / 255.0
    else:
        img = images.astype(dtype)
    im_512 = to_res(img, 512)
    im_256 = to_res(img, 256)
    im_256_norm = im_256 * 2.0 - 1.0

    # e4e W+ codes (norm-256 input; latent_avg folded in e4e params)
    latent_W = e4e.e4e_encode(zoo["e4e"], im_256_norm)

    # FSE S codes + content feature (norm-1024 halved twice to 256)
    fse_in = fse_downscale(img * 2.0 - 1.0)
    latent_S, (content,) = iresnet.fs_encode(zoo["fse"], fse_in)
    latent_S = latent_S + zoo["fse_latent_avg"].astype(latent_S.dtype)[None]

    # F space: resume generator at pair 3 from the 16x16 content map
    latent_F, _ = stylegan2.synthesis(
        zoo["generator"], latent_S, start_layer=3, end_layer=3,
        layer_in=content, cfg=cfg.stylegan, dtype=dtype)

    # BiSeNet masks at 512 -> 256 labels
    masks = bisenet.segment_256(zoo["bisenet"], im_512)

    if mix:
        hair = (masks == cfg.hair_label).astype(dtype)[..., None]
        hair32 = resize(hair, (32, 32), "bicubic")
        latent_F_from_W, _ = stylegan2.synthesis(
            zoo["generator"], latent_W, start_layer=0, end_layer=3,
            cfg=cfg.stylegan, dtype=dtype)
        latent_F = latent_F + cfg.mixing * hair32 * (latent_F_from_W - latent_F)

    return {
        "W": latent_W,
        "F": latent_F,
        "S": latent_S,
        "mask": masks,
        "image_256": im_256,
        "image_norm_256": im_256_norm,
    }


def e4e_embed(zoo: Dict, images_norm: Array, *,
              cfg: HairFastConfig = HairFastConfig(), dtype=jnp.float32) -> Dict[str, Array]:
    """get_e4e_embed (Embedding.py:44-54): W from [-1,1] 256 images, F = G[0..3](W)."""
    latent_W = e4e.e4e_encode(zoo["e4e"], images_norm.astype(dtype))
    latent_F, _ = stylegan2.synthesis(
        zoo["generator"], latent_W, start_layer=0, end_layer=3,
        cfg=cfg.stylegan, dtype=dtype)
    return {"W": latent_W, "F": latent_F}
