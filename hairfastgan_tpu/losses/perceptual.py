"""LPIPS (alex, v0.1) perceptual loss, TPU-native NHWC.

Rebuilds the vendored LPIPS of reference losses/pp_losses.py:380-542:
AlexNet feature trunk (torchvision layout), per-layer channel-L2 unit
normalization, learned 1x1 linear weights, spatial mean, summed over layers;
plus the multi-scale LPIPSScaleLoss (256/128/64 bilinear pyramid).

Inputs follow the reference convention: [-1,1] images, z-scored with the
LPIPS shift/scale (BaseNet buffers, pp_losses.py:403-409).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.layers import init_conv
from hairfastgan_tpu.ops.basic import conv2d_p, max_pool, relu
from hairfastgan_tpu.ops.resample import resize

Array = jax.Array

LPIPS_MEAN = (-0.030, -0.088, -0.188)
LPIPS_STD = (0.458, 0.448, 0.450)

# torchvision alexnet.features conv geometry: (k, stride, pad, out_ch)
_ALEX_CONVS = ((11, 4, 2, 64), (5, 1, 2, 192), (3, 1, 1, 384),
               (3, 1, 1, 256), (3, 1, 1, 256))
_ALEX_LIN_CH = (64, 192, 384, 256, 256)


def init_lpips_alex(key) -> Dict:
    keys = jax.random.split(key, 10)
    cin = 3
    convs = []
    for i, (k, s, p, cout) in enumerate(_ALEX_CONVS):
        convs.append(init_conv(keys[i], k, cin, cout))
        cin = cout
    lins = [init_conv(keys[5 + i], 1, c, 1, bias=False)
            for i, c in enumerate(_ALEX_LIN_CH)]
    return {"convs": convs, "lins": lins}


def convert_lpips_alex(alex_sd, lin_sd) -> Dict:
    """torchvision alexnet.features + lpips lin state_dicts -> params."""
    from hairfastgan_tpu.params.convert import t_conv

    conv_names = ["0", "3", "6", "8", "10"]
    convs = [t_conv(alex_sd, n) for n in conv_names]
    lins = []
    for i in range(5):
        for cand in (f"{i}.1", f"lin{i}.model.1"):
            if f"{cand}.weight" in lin_sd:
                lins.append(t_conv(lin_sd, cand))
                break
    return {"convs": convs, "lins": lins}


def _alex_features(p, x: Array) -> List[Array]:
    """Normalized input -> activations after each ReLU (target layers)."""
    feats = []
    specs = _ALEX_CONVS
    for i, (conv, (k, s, pad, _)) in enumerate(zip(p["convs"], specs)):
        x = relu(conv2d_p(conv, x, stride=s, padding=pad))
        feats.append(x)
        if i in (0, 1):  # maxpool after relu1 and relu2 (torchvision alexnet)
            x = max_pool(x, 3, 2)
    return feats


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (n + eps)


def lpips(p, x: Array, y: Array) -> Array:
    """x, y: [-1,1] NHWC -> scalar mean LPIPS distance."""
    mean = jnp.asarray(LPIPS_MEAN, x.dtype)
    std = jnp.asarray(LPIPS_STD, x.dtype)
    fx = _alex_features(p, (x - mean) / std)
    fy = _alex_features(p, (y - mean) / std)
    total = 0.0
    for a, b, lin in zip(fx, fy, p["lins"]):
        d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        total = total + jnp.mean(conv2d_p(lin, d), axis=(1, 2, 3))
    return jnp.mean(total)


def lpips_scale(p, x: Array, y: Array,
                scales: Sequence[int] = (256, 128, 64)) -> Array:
    """Multi-scale LPIPS (LPIPSScaleLoss, pp_losses.py:531-542)."""
    total = 0.0
    for res in scales:
        xs = resize(x, (res, res), "bilinear")
        ys = resize(y, (res, res), "bilinear")
        total = total + lpips(p, xs, ys)
    return total
