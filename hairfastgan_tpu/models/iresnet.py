"""ArcFace IR-ResNet trunk + FS-style feature encoders, TPU-native (NHWC).

Rebuilds the behavior of:
  * insightface IResNet / IBasicBlock       (reference models/Net.py:162-331)
  * FeatureEncoder / FeatureEncoderMult     (reference models/Net.py:334-477)
  * fs_encoder_v2                           (reference
    models/FeatureStyleEncoder/nets/feature_style_encoder.py:12-65)
  * FeatureiResnet                          (reference models/Encoders.py:35-57)

The ArcFace trunk (conv1/bn1/prelu + 4 residual stages) is ONE
implementation shared by the identity model, the FS inverter, and the
PostProcess encoder — the reference instantiates it three times.

Block math (IBasicBlock, Net.py:162-192):
    out = bn3(conv2_s(prelu(bn2(conv1(bn1(x)))))) + downsample(x)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.layers import (
    Static,
    init_bn,
    init_conv,
    init_conv_bn,
    init_linear,
    init_prelu,
)
from hairfastgan_tpu.ops.basic import (
    adaptive_avg_pool,
    batch_norm,
    conv2d_p,
    linear,
    prelu,
)

Array = jax.Array

IRESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 14, 3),
                  100: (3, 13, 30, 3), 200: (6, 26, 60, 6)}
STAGE_PLANES = (64, 128, 256, 512)

# content-head conv geometry per generator fs layer (reference Net.py:118-138)
FS_KERNELS = {0: (12, 12), 1: (12, 12), 2: (6, 6), 3: (6, 6),
              4: (3, 3), 5: (3, 3), 6: (3, 3), 7: (3, 3)}
FS_STRIDES = {0: (7, 7), 1: (7, 7), 2: (4, 4), 3: (4, 4),
              4: (2, 2), 5: (2, 2), 6: (1, 1), 7: (1, 1)}


# ---------------------------------------------------------------------------
# IBasicBlock / trunk
# ---------------------------------------------------------------------------

def init_ibasic_block(key, inplanes: int, planes: int, stride: int):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "bn1": init_bn(inplanes),
        "conv1": init_conv(k1, 3, inplanes, planes, bias=False),
        "bn2": init_bn(planes),
        "prelu": init_prelu(planes),
        "conv2": init_conv(k2, 3, planes, planes, bias=False),
        "bn3": init_bn(planes),
    }
    if stride != 1 or inplanes != planes:
        p["downsample"] = init_conv_bn(k3, 1, inplanes, planes)
    return p


def ibasic_block(p, x: Array, stride: int) -> Array:
    out = batch_norm(p["bn1"], x)
    out = conv2d_p(p["conv1"], out, padding=1)
    out = prelu(p["prelu"], batch_norm(p["bn2"], out))
    out = conv2d_p(p["conv2"], out, stride=stride, padding=1)
    out = batch_norm(p["bn3"], out)
    if "downsample" in p:
        identity = batch_norm(p["downsample"]["bn"],
                              conv2d_p(p["downsample"]["conv"], x, stride=stride))
    else:
        identity = x
    return out + identity


def init_trunk(key, depth: int = 50, width: float = 1.0):
    """conv1+bn1+prelu and the four stages (all strides 2, iresnet style).
    width < 1 scales every stage's channel count (micro test zoos)."""
    c = lambda n: max(16, int(n * width))
    layers = IRESNET_LAYERS[depth]
    keys = iter(jax.random.split(key, 4 + sum(layers)))
    p = {
        "conv1": init_conv(next(keys), 3, 3, c(64), bias=False),
        "bn1": init_bn(c(64)),
        "prelu": init_prelu(c(64)),
        "stages": [],
    }
    inplanes = c(64)
    for planes, n in zip([c(q) for q in STAGE_PLANES], layers):
        blocks = [init_ibasic_block(next(keys), inplanes, planes, 2)]
        inplanes = planes
        for _ in range(n - 1):
            blocks.append(init_ibasic_block(next(keys), planes, planes, 1))
        p["stages"].append(blocks)
    return p


def trunk_stem(p, x: Array) -> Array:
    return prelu(p["prelu"], batch_norm(p["bn1"], conv2d_p(p["conv1"], x, padding=1)))


def trunk_stage(blocks, x: Array) -> Array:
    x = ibasic_block(blocks[0], x, stride=2)
    for b in blocks[1:]:
        x = ibasic_block(b, x, stride=1)
    return x


def trunk_features(p, x: Array) -> List[Array]:
    """Stem + 4 stages; returns the per-stage feature maps [f1, f2, f3, f4]."""
    x = trunk_stem(p, x)
    feats = []
    for blocks in p["stages"]:
        x = trunk_stage(blocks, x)
        feats.append(x)
    return feats


# ---------------------------------------------------------------------------
# Full ArcFace identity model (112x112 -> 512 embedding)
# ---------------------------------------------------------------------------

def init_arcface(key, depth: int = 50, num_features: int = 512):
    k1, k2 = jax.random.split(key)
    return {
        "trunk": init_trunk(k1, depth),
        "bn2": init_bn(512),
        "fc": init_linear(k2, 512 * 7 * 7, num_features),
        "features_bn": {  # BatchNorm1d, weight frozen to 1 (Net.py:240-242)
            "gamma": jnp.ones((num_features,), jnp.float32),
            "beta": jnp.zeros((num_features,), jnp.float32),
            "mean": jnp.zeros((num_features,), jnp.float32),
            "var": jnp.ones((num_features,), jnp.float32),
        },
    }


@jax.named_scope("arcface")
def arcface_embed(p, x: Array) -> Array:
    """x: [B,112,112,3] in [-1,1] -> [B,512] identity embedding."""
    f4 = trunk_features(p["trunk"], x)[-1]
    y = batch_norm(p["bn2"], f4)
    # torch flattens NCHW (C,H,W) order; transpose to match converter layout
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
    y = linear(p["fc"], y)
    return batch_norm(p["features_bn"], y)


# ---------------------------------------------------------------------------
# FS-style encoders (FSE inverter & PostProcess encoder share this)
# ---------------------------------------------------------------------------

def _init_content_layer(key, cin: int, kernel, stride, out_ch: int = 512):
    k1, k2 = jax.random.split(key)
    return {
        "bn0": init_bn(cin),
        "conv1": init_conv(k1, 3, cin, out_ch, bias=False),
        "bn1": init_bn(out_ch),
        "prelu": init_prelu(out_ch),
        "conv2": init_conv(k2, kernel, out_ch, out_ch, bias=False),
        "bn2": init_bn(out_ch),
        "stride": Static(stride),
    }


def _content_layer(p, x: Array) -> Array:
    y = batch_norm(p["bn0"], x)
    y = conv2d_p(p["conv1"], y, padding=1)
    y = prelu(p["prelu"], batch_norm(p["bn1"], y))
    y = conv2d_p(p["conv2"], y, stride=p["stride"].value, padding=1)
    return batch_norm(p["bn2"], y)


def init_fs_encoder(
    key,
    n_styles: int = 18,
    fs_layers: Sequence[int] = (5,),
    depth: int = 50,
    width: float = 1.0,
    content_ch: int = 512,
):
    """fs_encoder_v2 / FeatureEncoderMult parameter tree.

    fs_layers follow the reference convention: <=7 taps block_3 output
    (256 ch), >7 taps block_2 output (128 ch) with kernel table shifted by 2
    (reference Net.py:396-420). width < 1 scales the TRUNK channels and
    content_ch sets the content-map width (micro test zoos; the real
    architecture is width=1.0, content_ch=512 — the structural F width).
    """
    c = lambda n: max(16, int(n * width))
    keys = jax.random.split(key, 3 + n_styles + len(fs_layers))
    shift = 0 if max(fs_layers) <= 7 else 2
    cin = c(256) if max(fs_layers) <= 7 else c(128)
    style_in = sum(c(q) for q in STAGE_PLANES) * 9
    p = {
        "trunk": init_trunk(keys[0], depth, width),
        "styles": [init_linear(keys[2 + i], style_in, 512) for i in range(n_styles)],
        "content": [
            _init_content_layer(keys[2 + n_styles + i], cin,
                                FS_KERNELS[l - shift], FS_STRIDES[l - shift],
                                out_ch=content_ch)
            for i, l in enumerate(fs_layers)
        ],
        "fs_layers": Static(tuple(fs_layers)),
    }
    return p


def pack_fs_styles(p):
    """Stack the n_styles Linear(960*9 -> 512) heads into one [n,8640,512]
    einsum operand (exact, idempotent). The heads are the zoo's single
    largest weight family (~80 M params).

    MEASURED SLIGHTLY SLOWER on v5e (fs_encode B=3: 2.1 -> 2.3 ms/call)
    — the batched matmul at M=3 tiles worse than 18 independent matmuls.
    Opt-in via zoo.pack_zoo; not the api/bench default."""
    if "styles_w" in p or "styles" not in p:
        return p
    q = dict(p)
    q["styles_w"] = jnp.stack([h["w"] for h in p["styles"]])
    q["styles_b"] = jnp.stack([h["b"] for h in p["styles"]])
    del q["styles"]
    return q


@jax.named_scope("fs_encoder")
def fs_encode(p, x: Array) -> Tuple[Array, List[Array]]:
    """x: [B,256,256,3] normalized -> (S [B,n_styles,512], [content maps]).

    Reference forward: Net.py:447-477 / feature_style_encoder.py:47-65.
    Style head input = concat of AdaptiveAvgPool(3,3) of all 4 stage outputs
    (channel order preserved), flattened in torch NCHW order.
    """
    tap_block2 = max(p["fs_layers"].value) > 7
    feats = trunk_features(p["trunk"], x)
    content = []
    src = feats[1] if tap_block2 else feats[2]
    for cl in p["content"]:
        content.append(_content_layer(cl, src))

    pooled = [adaptive_avg_pool(f, (3, 3)) for f in feats]  # each [B,3,3,C]
    # torch: cat over channels then flatten NCHW -> [B, 960*9] with layout
    # (channel-major); emulate by transposing to NCHW before reshape.
    cat = jnp.concatenate([jnp.transpose(f, (0, 3, 1, 2)) for f in pooled], axis=1)
    flat = cat.reshape(cat.shape[0], -1)
    if "styles_w" in p:  # packed layout (pack_fs_styles)
        styles = (jnp.einsum("bf,kfd->bkd", flat,
                             p["styles_w"].astype(flat.dtype),
                             preferred_element_type=flat.dtype)
                  + p["styles_b"].astype(flat.dtype))
    else:
        styles = jnp.stack([linear(h, flat) for h in p["styles"]], axis=1)
    return styles, content


# ---------------------------------------------------------------------------
# FeatureiResnet (PostProcess F-fuser, reference models/Encoders.py:35-57)
# ---------------------------------------------------------------------------

def init_feature_iresnet(key, blocks: Sequence[Tuple[int, int]] = ((1024, 2), (768, 2), (512, 2)),
                         inplanes: int = 1024):
    keys = iter(jax.random.split(key, sum(n for _, n in blocks)))
    p = []
    for planes, n in blocks:
        for _ in range(n):
            p.append(init_ibasic_block(next(keys), inplanes, planes, 1))
            inplanes = planes
    return p


def feature_iresnet(p, x: Array) -> Array:
    for block in p:
        x = ibasic_block(block, x, stride=1)
    return x
