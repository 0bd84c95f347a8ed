"""CLIP ViT-B/32 image tower, TPU-native.

Rebuilds the image half of OpenAI CLIP (loaded via the `clip` pip package in
the reference, models/Encoders.py:78,143): 32x32 patch conv -> class token +
positional embedding -> pre-LN -> 12 residual attention blocks (QuickGELU
MLP) -> post-LN on the class token -> projection to the 512-d joint space.

The reference runs it in fp16 on CUDA; here compute dtype is a parameter
(bf16 on TPU). Attention is a single fused einsum pair per block — at 50
tokens the whole tower is matmul-bound and lives on the MXU.

Preprocessing helper matches ClipBlendingModel.get_image_embed
(models/Encoders.py:89-92): adaptive-avg-pool to 224, then CLIP mean/std on
[0,1] images.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.layers import init_linear, init_ln
from hairfastgan_tpu.ops.basic import adaptive_avg_pool, conv2d, layer_norm, linear

Array = jax.Array

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(img01: Array) -> Array:
    """[0,1] NHWC (any square size) -> normalized [B,224,224,3]."""
    x = adaptive_avg_pool(img01, (224, 224))
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


def init_block(key, width: int, heads: int):
    keys = jax.random.split(key, 4)
    return {
        "ln1": init_ln(width),
        "attn": {
            "in_proj": init_linear(keys[0], width, 3 * width),
            "out_proj": init_linear(keys[1], width, width),
        },
        "ln2": init_ln(width),
        "mlp": {
            "fc": init_linear(keys[2], width, 4 * width),
            "proj": init_linear(keys[3], 4 * width, width),
        },
    }


def _attention(p, x: Array, h: int) -> Array:
    b, t, c = x.shape
    qkv = linear(p["in_proj"], x)  # [B,T,3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(c // h)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    y = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=x.dtype)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
    return linear(p["out_proj"], y)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def block(p, x: Array) -> Array:
    heads = x.shape[-1] // 64  # CLIP convention: head_dim = 64
    x = x + _attention(p["attn"], layer_norm(x, -1, p["ln1"]["gamma"], p["ln1"]["beta"]),
                       heads)
    h = layer_norm(x, -1, p["ln2"]["gamma"], p["ln2"]["beta"])
    h = linear(p["mlp"]["proj"], quick_gelu(linear(p["mlp"]["fc"], h)))
    return x + h


def init_clip_image_tower(key, width: int = 768, layers: int = 12, heads: int = 12,
                          patch: int = 32, image_size: int = 224, embed_dim: int = 512):
    keys = jax.random.split(key, layers + 3)
    grid = image_size // patch
    scale = width ** -0.5
    return {
        "patch_conv": {"w": jax.random.normal(keys[0], (patch, patch, 3, width)) * scale},
        "class_emb": jax.random.normal(keys[1], (width,)) * scale,
        "pos_emb": jax.random.normal(keys[2], (grid * grid + 1, width)) * scale,
        "ln_pre": init_ln(width),
        "blocks": [init_block(k, width, heads) for k in keys[3:]],
        "ln_post": init_ln(width),
        "proj": jax.random.normal(keys[0], (width, embed_dim)) * scale,
    }


@jax.named_scope("clip")
def clip_encode_image(p, x: Array) -> Array:
    """x: preprocessed [B,224,224,3] -> [B,512] image embedding."""
    y = conv2d(x, p["patch_conv"]["w"], stride=p["patch_conv"]["w"].shape[0])
    b, gh, gw, c = y.shape
    y = y.reshape(b, gh * gw, c)
    cls = jnp.tile(p["class_emb"].astype(y.dtype)[None, None], (b, 1, 1))
    y = jnp.concatenate([cls, y], axis=1) + p["pos_emb"].astype(y.dtype)[None]
    y = layer_norm(y, -1, p["ln_pre"]["gamma"], p["ln_pre"]["beta"])
    for blk in p["blocks"]:
        y = block(blk, y)
    y = layer_norm(y[:, 0], -1, p["ln_post"]["gamma"], p["ln_post"]["beta"])
    return jnp.dot(y, p["proj"].astype(y.dtype), preferred_element_type=y.dtype)
