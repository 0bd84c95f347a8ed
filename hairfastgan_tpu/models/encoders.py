"""The four trained "glue" encoders: Rotate, ClipBlending, PostProcess (+
the bare CLIP FID feature extractor), TPU-native.

Rebuilds reference models/Encoders.py:13-160. These are the only modules the
HairFast authors trained; everything else in the zoo is frozen. All are
stacks of ModulationModule — a FiLM block:

    x = LayerNorm_{rows,512}(Linear(x));  out = x*(1+gamma(e)) + beta(e)
    gamma/beta = Linear(inp,mid) -> LayerNorm(mid) -> LeakyReLU(0.01)
                 -> Linear(mid,512)
    (+ LeakyReLU(0.01) after, except the last block)

PixelNorm here is over torch dim=1 == the *rows* axis of [B, rows, 512]
(models/stylegan2/model.py:16-21 applied to 3-D input).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models import iresnet
from hairfastgan_tpu.models.clip_vit import clip_encode_image, clip_preprocess
from hairfastgan_tpu.models.layers import init_linear, mlp_ln_lrelu
from hairfastgan_tpu.ops.basic import layer_norm, leaky_relu, linear
from hairfastgan_tpu.ops.equalized import pixel_norm
from hairfastgan_tpu.ops.resample import resize

Array = jax.Array


# ---------------------------------------------------------------------------
# ModulationModule
# ---------------------------------------------------------------------------

def init_modulation_module(key, rows: int, inp: int = 512, middle: int = 512):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc": init_linear(k1, 512, 512),
        "gamma": mlp_ln_lrelu(k2, inp, middle, 512),
        "beta": mlp_ln_lrelu(k3, inp, middle, 512),
    }


def _branch(p, e: Array) -> Array:
    h = linear(p["fc1"], e)
    h = layer_norm(h, -1, p["ln"]["gamma"], p["ln"]["beta"])
    return linear(p["fc2"], leaky_relu(h, 0.01))


def modulation_module(p, x: Array, embedding: Array, last: bool) -> Array:
    """x [B,rows,512]; embedding [B,rows,inp] (reference Encoders.py:24-32)."""
    y = linear(p["fc"], x)
    y = layer_norm(y, (-2, -1))  # LayerNorm([rows,512]) affine-free
    gamma = _branch(p["gamma"], embedding)
    beta = _branch(p["beta"], embedding)
    out = y * (1 + gamma) + beta
    return out if last else leaky_relu(out, 0.01)


def modulation_stack(mods, x: Array, embedding: Array) -> Array:
    for i, m in enumerate(mods):
        x = modulation_module(m, x, embedding, last=(i == len(mods) - 1))
    return x


# ---------------------------------------------------------------------------
# RotateModel (Encoders.py:60-71)
# ---------------------------------------------------------------------------

def init_rotate_model(key):
    return {"mods": [init_modulation_module(k, 6)
                     for k in jax.random.split(key, 5)]}


def rotate_model(p, latent_from: Array, latent_to: Array) -> Array:
    """W[:, :6] of (shape src, face tgt) -> rotated W[:, :6]."""
    dt = pixel_norm(latent_from, axis=1)
    dt = modulation_stack(p["mods"], dt, latent_to)
    return latent_from + 0.1 * dt


# ---------------------------------------------------------------------------
# ClipBlendingModel (Encoders.py:74-103)
# ---------------------------------------------------------------------------

def init_blending_model(key, clip_params=None):
    ks = jax.random.split(key, 6)
    return {
        "mods": [init_modulation_module(k, 12, inp=512 * 3, middle=1024)
                 for k in ks[:5]],
        "clip": clip_params,  # frozen tower, stripped from trained ckpts
    }


def clip_image_embed(clip_params, img_norm: Array) -> Array:
    """[-1,1] image -> CLIP embedding (get_image_embed, Encoders.py:89-92)."""
    return clip_encode_image(clip_params, clip_preprocess(img_norm * 0.5 + 0.5))


def blending_model(p, latent_face: Array, latent_color: Array,
                   target_face: Array, hair_color: Array) -> Array:
    """S1[:,6:], S3[:,6:], masked face image, masked color image -> S_blend[6:].

    Images are [-1,1] normalized 256^2 NHWC (Encoders.py:94-103).
    """
    rows = latent_color.shape[1]  # 12 for the 1024 config (18-6)
    b = target_face.shape[0]
    # one batched CLIP tower pass for both crops (reference: two forwards,
    # Encoders.py:95-96)
    both = clip_image_embed(p["clip"],
                            jnp.concatenate([target_face, hair_color], axis=0))
    ef = both[:b][:, None, :]
    ec = both[b:][:, None, :]
    emb = jnp.concatenate([
        latent_color,
        jnp.tile(ef, (1, rows, 1)).astype(latent_color.dtype),
        jnp.tile(ec, (1, rows, 1)).astype(latent_color.dtype),
    ], axis=-1)
    dt = pixel_norm(latent_face, axis=1)
    dt = modulation_stack(p["mods"], dt, emb)
    return latent_face + 0.1 * dt


# ---------------------------------------------------------------------------
# PostProcessModel (Encoders.py:106-137)
# ---------------------------------------------------------------------------

def init_post_process_model(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "encoder_face": iresnet.init_fs_encoder(k1, n_styles=18, fs_layers=(9,)),
        "latent_avg": jnp.zeros((18, 512), jnp.float32),
        "to_feature": iresnet.init_feature_iresnet(k2),
        "to_latent_1": [init_modulation_module(k, 18)
                        for k in jax.random.split(k3, 5)],
        "to_latent_2": [init_modulation_module(k, 18)
                        for k in jax.random.split(k4, 5)],
    }


def init_post_process_train_model(key, use_mod: bool = True, n_latent: int = 18):
    """Training-variant parameter tree (scripts/pp_train.py:278-298):
    use_mod=False swaps the two modulation stacks for a plain
    Linear(1024,1024)+LN+LReLU+Linear(1024,512) head over cat(s_face, s_hair)."""
    p = init_post_process_model(key)
    if not use_mod:
        k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
        del p["to_latent_1"], p["to_latent_2"]
        p["to_latent"] = mlp_ln_lrelu(k1, 1024, 1024, 512)
    return p


def post_process_model_train(
    p, source: Array, target: Array, target_mask: Optional[Array] = None,
    *, pretrain: bool = False, use_mod: bool = True, use_full: bool = True,
) -> Tuple[Array, Array]:
    """Training forward with the reference's variant flags
    (pp_train.py:299-327): pretrain returns the single-image inversion;
    use_full=False blends the two F maps with the 64x64 target mask."""
    from hairfastgan_tpu.ops.resample import resize as _resize

    s_face, [f_face] = iresnet.fs_encode(p["encoder_face"], source)
    avg = p["latent_avg"].astype(s_face.dtype)[None]
    if pretrain:
        return avg + s_face, f_face

    s_hair, [f_hair] = iresnet.fs_encode(p["encoder_face"], target)

    if use_mod:
        d_face = modulation_stack(p["to_latent_1"], pixel_norm(s_face, axis=1),
                                  s_hair)
        d_hair = modulation_stack(p["to_latent_2"], pixel_norm(s_hair, axis=1),
                                  s_face)
        s_final = avg + 0.1 * (d_face + d_hair)
    else:
        cat_s = jnp.concatenate([s_face, s_hair], axis=-1)
        s_final = avg + _branch(p["to_latent"], cat_s)

    if use_full:
        cat_f = jnp.concatenate([f_face, f_hair], axis=-1)
    else:
        tm = _resize(target_mask, (64, 64), "nearest")
        cat_f = jnp.concatenate([f_face * tm, f_hair * (1 - tm)], axis=-1)
    return s_final, iresnet.feature_iresnet(p["to_feature"], cat_f)


def post_process_model(p, source: Array, target: Array) -> Tuple[Array, Array]:
    """(I_face_norm256, I_blend_norm256) -> (S_final [B,18,512], F_final [B,64,64,512])."""
    # FeatureEncoderMult resizes inputs to 256 first (Net.py:12-14,447)
    if source.shape[1] != 256:
        source = resize(source, (256, 256), "bilinear")
    if target.shape[1] != 256:
        target = resize(target, (256, 256), "bilinear")
    # ONE batched trunk pass for both images (the reference runs the
    # encoder twice sequentially, Encoders.py:120-121) — double the MXU
    # batch at no extra HBM weight traffic
    b = source.shape[0]
    s_both, [f_both] = iresnet.fs_encode(
        p["encoder_face"], jnp.concatenate([source, target], axis=0))
    s_face, s_hair = s_both[:b], s_both[b:]
    f_face, f_hair = f_both[:b], f_both[b:]

    d_face = modulation_stack(p["to_latent_1"], pixel_norm(s_face, axis=1), s_hair)
    d_hair = modulation_stack(p["to_latent_2"], pixel_norm(s_hair, axis=1), s_face)
    s_final = p["latent_avg"].astype(s_face.dtype)[None] + 0.1 * (d_face + d_hair)

    cat_f = jnp.concatenate([f_face, f_hair], axis=-1)  # torch cat dim=1 == channels
    f_final = iresnet.feature_iresnet(p["to_feature"], cat_f)
    return s_final, f_final
