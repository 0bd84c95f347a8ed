"""StyleGAN2 config-f synthesis with the HairFast layer-slice API, TPU-first.

Reference semantics: models/stylegan2/model.py:368-594 (rosinality generator
extended with start_layer / end_layer / layer_in slicing). This is a pure
function over a parameter pytree; slicing arguments are Python-static so each
used slice compiles to its own XLA program with fully static shapes.

Layer-pair layout (matching the reference loop model.py:534-557):
  pair 0: conv1 @4x4 + to_rgb1                      styles latent[:, 0], [:, 1]
  pair l in 1..8: up-conv + conv + to_rgb @ 2^(l+2) styles [:, 2l-1], [:, 2l], [:, 2l+1]
Noise buffers: 17 maps, pair l uses noise[2l-1], noise[2l] (pair 0 uses noise[0]).

All tensors NHWC; compute dtype selectable (bf16 for the production path,
f32 for parity tests).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.config import StyleGANConfig
from hairfastgan_tpu.ops.equalized import equal_linear, pixel_norm
from hairfastgan_tpu.ops.fused_act import fused_leaky_relu
from hairfastgan_tpu.ops.modconv import modulated_conv2d
from hairfastgan_tpu.ops.upfirdn2d import upsample2d

Array = jax.Array


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def _init_equal_linear(key, in_dim, out_dim, lr_mul=1.0, bias_init=0.0):
    return {
        "w": jax.random.normal(key, (in_dim, out_dim), jnp.float32) / lr_mul,
        "b": jnp.full((out_dim,), bias_init, jnp.float32),
    }


def _init_modconv(key, in_ch, out_ch, k, style_dim, up=False):
    k1, k2 = jax.random.split(key)
    # stored HWIO; for up=True store the transposed-conv kernel already in
    # forward (lhs-dilated conv) form: spatially flipped
    w = jax.random.normal(k1, (k, k, in_ch, out_ch), jnp.float32)
    return {
        "w": w,
        "modulation": _init_equal_linear(k2, style_dim, in_ch, bias_init=1.0),
    }


def init_generator_params(key, cfg: StyleGANConfig = StyleGANConfig()):
    """Random-init parameter pytree with the same shapes the converter fills."""
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    style = [
        _init_equal_linear(next(ki), cfg.style_dim, cfg.style_dim, lr_mul=cfg.lr_mlp)
        for _ in range(cfg.n_mlp)
    ]

    ch4 = cfg.channels(4)
    params = {
        "style": style,
        "input": jax.random.normal(next(ki), (1, 4, 4, ch4), jnp.float32),
        "conv1": {
            "conv": _init_modconv(next(ki), ch4, ch4, 3, cfg.style_dim),
            "noise_weight": jnp.zeros((), jnp.float32),
            "bias": jnp.zeros((ch4,), jnp.float32),
        },
        "to_rgb1": {
            "conv": _init_modconv(next(ki), ch4, 3, 1, cfg.style_dim),
            "bias": jnp.zeros((3,), jnp.float32),
        },
        "convs": [],
        "to_rgbs": [],
    }

    in_ch = ch4
    for i in range(3, cfg.log_size + 1):
        out_ch = cfg.channels(2 ** i)
        params["convs"].append({
            "conv": _init_modconv(next(ki), in_ch, out_ch, 3, cfg.style_dim, up=True),
            "noise_weight": jnp.zeros((), jnp.float32),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        })
        params["convs"].append({
            "conv": _init_modconv(next(ki), out_ch, out_ch, 3, cfg.style_dim),
            "noise_weight": jnp.zeros((), jnp.float32),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        })
        params["to_rgbs"].append({
            "conv": _init_modconv(next(ki), out_ch, 3, 1, cfg.style_dim),
            "bias": jnp.zeros((3,), jnp.float32),
        })
        in_ch = out_ch
    return params


def make_noise(key, cfg: StyleGANConfig = StyleGANConfig(), batch: int = 1):
    """Fresh per-call gaussian noise maps (reference NoiseInjection None path)."""
    noises = []
    keys = jax.random.split(key, cfg.num_layers)
    for idx in range(cfg.num_layers):
        res = 2 ** ((idx + 5) // 2)
        noises.append(jax.random.normal(keys[idx], (batch, res, res, 1), jnp.float32))
    return noises


def zero_noise(cfg: StyleGANConfig = StyleGANConfig(), batch: int = 1):
    return [jnp.zeros((batch, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1),
                      jnp.float32) for i in range(cfg.num_layers)]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def mapping(params, z: Array, cfg: StyleGANConfig = StyleGANConfig()) -> Array:
    """z -> w through PixelNorm + 8x EqualLinear(fused_lrelu, lr_mul 0.01)."""
    x = pixel_norm(z, axis=-1)
    for lp in params["style"]:
        x = equal_linear(lp, x, lr_mul=cfg.lr_mlp, activation="fused_lrelu")
    return x


def _styled_conv(p, x, style, noise, *, up=False, dtype=None):
    y = modulated_conv2d(p["conv"], x, style, demodulate=True, up=up)
    if noise is not None:
        y = y + p["noise_weight"].astype(y.dtype) * noise.astype(y.dtype)
    return fused_leaky_relu(y, p["bias"])


def _to_rgb(p, x, style, skip=None):
    y = modulated_conv2d(p["conv"], x, style, demodulate=False)
    y = y + p["bias"].astype(y.dtype)
    if skip is not None:
        y = y + upsample2d(skip)
    return y


@jax.named_scope("stylegan2_synthesis")
def synthesis(
    params,
    latent: Array,
    *,
    noise: Optional[Sequence[Optional[Array]]] = None,
    noise_key: Optional[Array] = None,
    start_layer: int = 0,
    end_layer: int = 8,
    layer_in: Optional[Array] = None,
    skip: Optional[Array] = None,
    cfg: StyleGANConfig = StyleGANConfig(),
    dtype=jnp.float32,
) -> Tuple[Array, Array]:
    """Sliced synthesis matching Generator.forward (model.py:477-565).

    latent: [B, n_latent, 512] W+ codes (input_is_latent=True path).
    noise: list of 17 maps, or None. With noise=None and noise_key=None the
    call is noise-free (zero noise); passing noise_key draws fresh gaussian
    noise like the reference's randomize_noise=True.
    Returns (features_out, rgb_skip) of the last executed pair — callers
    slicing for F space read features_out; full renders read rgb_skip.
    """
    b = latent.shape[0]
    if noise is None:
        if noise_key is not None:
            noise = make_noise(noise_key, cfg, batch=b)
        else:
            noise = [None] * cfg.num_layers

    latent = latent.astype(dtype)
    out = None

    if start_layer == 0:
        x = jnp.tile(params["input"].astype(dtype), (b, 1, 1, 1))
        out = _styled_conv(params["conv1"], x, latent[:, 0], noise[0])
        skip = _to_rgb(params["to_rgb1"], out, latent[:, 1])
    if end_layer == 0:
        return out, skip

    for pair in range(1, cfg.log_size - 1):
        if pair < start_layer:
            continue
        if pair > end_layer:
            break
        i = 2 * pair - 1
        src = layer_in.astype(dtype) if pair == start_layer and start_layer > 0 else out
        h = _styled_conv(params["convs"][2 * pair - 2], src, latent[:, i],
                         noise[i], up=True)
        out = _styled_conv(params["convs"][2 * pair - 1], h, latent[:, i + 1],
                           noise[i + 1])
        skip = _to_rgb(params["to_rgbs"][pair - 1], out, latent[:, i + 2],
                       skip if skip is not None else None)

    return out, skip


def generate(
    params,
    latent: Array,
    *,
    noise=None,
    noise_key=None,
    cfg: StyleGANConfig = StyleGANConfig(),
    dtype=jnp.float32,
) -> Array:
    """Full 0..8 render -> RGB in [-1, 1] (NHWC)."""
    _, rgb = synthesis(params, latent, noise=noise, noise_key=noise_key,
                       cfg=cfg, dtype=dtype)
    return rgb


def mean_latent(params, key, n: int, cfg: StyleGANConfig = StyleGANConfig()) -> Array:
    z = jax.random.normal(key, (n, cfg.style_dim), jnp.float32)
    return jnp.mean(mapping(params, z, cfg), axis=0, keepdims=True)


def latent_to_wplus(w: Array, n_latent: int = 18) -> Array:
    """[B,512] -> [B,n_latent,512] broadcast (reference model.py:515-522)."""
    if w.ndim == 3:
        return w
    return jnp.tile(w[:, None, :], (1, n_latent, 1))
