"""StyleGAN2 discriminator (rosinality layout), TPU-native NHWC.

Rebuilds reference models/stylegan2/model.py:597-725: ConvLayer stack of
blur-downsampled ResBlocks (skip branch /sqrt(2)), minibatch-stddev feature,
final conv + 2-layer EqualLinear head. Used by the PostProcess adversarial
phase (scripts/pp_train.py:59-63,144-178) — the reference loads an NVlabs
pkl discriminator there; architecturally both are the same residual
config-f discriminator, and our converter maps the rosinality layout.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import StyleGANConfig
from hairfastgan_tpu.ops.basic import conv2d
from hairfastgan_tpu.ops.equalized import equal_linear
from hairfastgan_tpu.ops.fused_act import fused_leaky_relu
from hairfastgan_tpu.ops.upfirdn2d import blur2d

Array = jax.Array


def _init_conv(key, k, cin, cout):
    return {"w": jax.random.normal(key, (k, k, cin, cout), jnp.float32)}


def _equal_conv(p, x, *, stride=1, padding=0, bias=None, activate=True):
    kh, kw, cin, _ = p["w"].shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    y = conv2d(x, p["w"].astype(x.dtype) * scale, stride=stride, padding=padding)
    if activate:
        return fused_leaky_relu(y, bias)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def init_discriminator(key, cfg: StyleGANConfig = StyleGANConfig()):
    keys = iter(jax.random.split(key, 64))
    log_size = cfg.log_size
    ch = cfg.channels

    p = {
        "conv_in": {"conv": _init_conv(next(keys), 1, 3, ch(cfg.size)),
                    "bias": jnp.zeros((ch(cfg.size),), jnp.float32)},
        "blocks": [],
        "final_conv": {"conv": _init_conv(next(keys), 3, ch(4) + 1, ch(4)),
                       "bias": jnp.zeros((ch(4),), jnp.float32)},
        "final_linear1": {"w": jax.random.normal(next(keys), (ch(4) * 16, ch(4))),
                          "b": jnp.zeros((ch(4),), jnp.float32)},
        "final_linear2": {"w": jax.random.normal(next(keys), (ch(4), 1)),
                          "b": jnp.zeros((1,), jnp.float32)},
    }
    in_ch = ch(cfg.size)
    for i in range(log_size, 2, -1):
        out_ch = ch(2 ** (i - 1))
        p["blocks"].append({
            "conv1": {"conv": _init_conv(next(keys), 3, in_ch, in_ch),
                      "bias": jnp.zeros((in_ch,), jnp.float32)},
            "conv2": {"conv": _init_conv(next(keys), 3, in_ch, out_ch),
                      "bias": jnp.zeros((out_ch,), jnp.float32)},
            "skip": {"conv": _init_conv(next(keys), 1, in_ch, out_ch)},
        })
        in_ch = out_ch
    return p


def _down_conv(p, x, blur_kernel=(1, 3, 3, 1)):
    """Blur + stride-2 conv (ConvLayer downsample=True, model.py:601-627)."""
    k = p["w"].shape[0]
    pk = len(blur_kernel)
    pp = (pk - 2) + (k - 1)
    x = blur2d(x, blur_kernel, pad=((pp + 1) // 2, pp // 2))
    return x, k


def discriminator(p, img: Array) -> Array:
    """img [B,H,W,3] in [-1,1] -> logits [B,1] (model.py:697-725)."""
    x = _equal_conv(p["conv_in"]["conv"], img, padding=0,
                    bias=p["conv_in"]["bias"])
    for blk in p["blocks"]:
        h = _equal_conv(blk["conv1"]["conv"], x, padding=1, bias=blk["conv1"]["bias"])
        hb, k = _down_conv(blk["conv2"]["conv"], h)
        h = _equal_conv(blk["conv2"]["conv"], hb, stride=2, padding=0,
                        bias=blk["conv2"]["bias"])
        sb, _ = _down_conv(blk["skip"]["conv"], x)
        s = _equal_conv(blk["skip"]["conv"], sb, stride=2, padding=0,
                        activate=False)
        x = (h + s) / math.sqrt(2)

    # minibatch stddev (model.py:643-664): group stat appended as 1 channel
    b, hh, ww, c = x.shape
    group = min(b, 4)
    g = x.reshape(group, b // group, hh, ww, 1, c)
    var = jnp.var(g, axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True).squeeze(4)
    stddev = jnp.tile(stddev, (group, hh, ww, 1))
    x = jnp.concatenate([x, stddev], axis=-1)

    x = _equal_conv(p["final_conv"]["conv"], x, padding=1,
                    bias=p["final_conv"]["bias"])
    # torch flattens NCHW order
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    x = equal_linear(p["final_linear1"], x, activation="fused_lrelu")
    return equal_linear(p["final_linear2"], x)
