"""Equalized-learning-rate layers + PixelNorm (StyleGAN2 primitives).

Reference: models/stylegan2/model.py:16-180. Runtime weight scaling
(w * 1/sqrt(fan_in) * lr_mul) is kept exactly; on TPU the scale folds into
the matmul epilogue under XLA.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from hairfastgan_tpu.ops.basic import conv2d
from hairfastgan_tpu.ops.fused_act import fused_leaky_relu

Array = jax.Array


def pixel_norm(x: Array, axis: int = -1) -> Array:
    """x * rsqrt(mean(x^2, channel) + 1e-8) (model.py:16-21).

    Channel axis defaults to the last axis; reference latents [B, L, 512] use
    axis=-1 there too (LayerNorm-style rows), matching torch dim=1 only for
    2-D inputs — RotateModel/Blending call PixelNorm on [B, rows, 512] where
    torch dim=1 is the *rows* axis; pass axis=1 for that case.
    """
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=axis, keepdims=True) + 1e-8)
    return n.astype(x.dtype)


def equal_linear(
    p,
    x: Array,
    lr_mul: float = 1.0,
    activation: Optional[str] = None,
) -> Array:
    """EqualLinear (model.py:134-163): w:[in,out] stored /lr_mul like torch."""
    in_dim = p["w"].shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = p["w"].astype(x.dtype) * jnp.asarray(scale, x.dtype)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    b = p.get("b")
    if activation == "fused_lrelu":
        return fused_leaky_relu(y, b.astype(x.dtype) * lr_mul if b is not None else None)
    if b is not None:
        y = y + b.astype(x.dtype) * lr_mul
    return y


def equal_conv2d(
    p,
    x: Array,
    stride: int = 1,
    padding: int = 0,
) -> Array:
    """EqualConv2d (model.py:96-125); weight HWIO."""
    kh, kw, cin, _ = p["w"].shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    w = p["w"] * scale
    return conv2d(x, w, p.get("b"), stride=stride, padding=padding)
