"""encoder4editing (e4e) W+ inverter, TPU-native NHWC.

Rebuilds the inference path of the reference e4e stack:
  * bottleneck_IR / bottleneck_IR_SE backbone
    (models/encoder4editing/models/encoders/helpers.py:80-131)
  * Encoder4Editing: w0 + progressive FPN deltas
    (models/encoder4editing/models/encoders/psp_encoders.py:126-200)
  * get_latents adds latent_avg (utils/model_utils.py:7-14)

Block math (bottleneck_IR_SE):
    res = SE(bn(conv3x3_s(prelu(conv3x3(bn_in(x))))))
    shortcut = maxpool1x1_s(x)  if in==depth else  bn(conv1x1_s(x))
    y = res + shortcut

FPN: c1 (128ch, idx 6), c2 (256ch, idx 20), c3 (512ch, idx 23);
p2 = up(c3)+lat1(c2), p1 = up(p2)+lat2(c1); bilinear align_corners=True.
Style heads: GradualStyleBlock = log2(spatial) stride-2 convs + EqualLinear.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.layers import (
    Static,
    init_bn,
    init_conv,
    init_conv_bn,
    init_prelu,
)
from hairfastgan_tpu.ops.basic import (
    avg_pool_global,
    batch_norm,
    conv2d_p,
    leaky_relu,
    prelu,
    relu,
    sigmoid,
)
from hairfastgan_tpu.ops.equalized import equal_linear
from hairfastgan_tpu.ops.resample import resize

Array = jax.Array

# (in_channel, depth, stride) per bottleneck, 50-layer config
# (helpers.py:30-37): 4 stages of [first stride-2, rest stride-1] units.
def _blocks_50(width: float = 1.0) -> List[Tuple[int, int, int]]:
    c = lambda n: max(16, int(n * width))
    spec = []
    for in_c, depth, n in ((64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)):
        spec.append((c(in_c), c(depth), 2))
        spec += [(c(depth), c(depth), 1)] * (n - 1)
    return spec


def init_bottleneck_ir(key, in_c: int, depth: int, stride: int, se: bool):
    keys = jax.random.split(key, 5)
    p = {
        "bn_in": init_bn(in_c),
        "conv1": init_conv(keys[0], 3, in_c, depth, bias=False),
        "prelu": init_prelu(depth),
        "conv2": init_conv(keys[1], 3, depth, depth, bias=False),
        "bn_out": init_bn(depth),
        "stride": Static(stride),
    }
    if in_c != depth:
        p["shortcut"] = init_conv_bn(keys[2], 1, in_c, depth)
    if se:
        p["se"] = {
            "fc1": init_conv(keys[3], 1, depth, depth // 16, bias=False),
            "fc2": init_conv(keys[4], 1, depth // 16, depth, bias=False),
        }
    return p


def bottleneck_ir(p, x: Array) -> Array:
    s = p["stride"].value
    res = batch_norm(p["bn_in"], x)
    res = prelu(p["prelu"], conv2d_p(p["conv1"], res, padding=1))
    res = batch_norm(p["bn_out"], conv2d_p(p["conv2"], res, stride=s, padding=1))
    if "se" in p:
        a = avg_pool_global(res)
        a = sigmoid(conv2d_p(p["se"]["fc2"], relu(conv2d_p(p["se"]["fc1"], a))))
        res = res * a
    if "shortcut" in p:
        short = batch_norm(p["shortcut"]["bn"],
                           conv2d_p(p["shortcut"]["conv"], x, stride=s))
    else:
        short = x[:, ::s, ::s, :] if s > 1 else x  # MaxPool2d(1, s) == subsample
    return res + short


def init_irse_body(key, se: bool = True, width: float = 1.0):
    c = lambda n: max(16, int(n * width))
    spec = _blocks_50(width)
    keys = jax.random.split(key, len(spec) + 1)
    return {
        "input": {
            "conv": init_conv(keys[0], 3, 3, c(64), bias=False),
            "bn": init_bn(c(64)),
            "prelu": init_prelu(c(64)),
        },
        "body": [init_bottleneck_ir(k, i, d, s, se)
                 for k, (i, d, s) in zip(keys[1:], spec)],
    }


def irse_stem(p, x: Array) -> Array:
    y = batch_norm(p["input"]["bn"], conv2d_p(p["input"]["conv"], x, padding=1))
    return prelu(p["input"]["prelu"], y)


def irse_pyramid(p, x: Array) -> Tuple[Array, Array, Array]:
    """Run the body, returning (c1, c2, c3) at indices 6/20/23."""
    x = irse_stem(p, x)
    c1 = c2 = c3 = None
    for i, blk in enumerate(p["body"]):
        x = bottleneck_ir(blk, x)
        if i == 6:
            c1 = x
        elif i == 20:
            c2 = x
        elif i == 23:
            c3 = x
    return c1, c2, c3


# ---------------------------------------------------------------------------
# GradualStyleBlock & Encoder4Editing
# ---------------------------------------------------------------------------

def init_gradual_style_block(key, in_c: int, out_c: int, spatial: int,
                             mid: int = None):
    mid = out_c if mid is None else mid
    n = int(math.log2(spatial))
    keys = jax.random.split(key, n + 1)
    return {
        "convs": [init_conv(keys[0], 3, in_c, mid)] +
                 [init_conv(keys[i], 3, mid, mid) for i in range(1, n)],
        "linear": {"w": jax.random.normal(keys[n], (mid, out_c)) ,
                   "b": jnp.zeros((out_c,), jnp.float32)},
    }


def gradual_style_block(p, x: Array) -> Array:
    for c in p["convs"]:
        x = leaky_relu(conv2d_p(c, x, stride=2, padding=1), 0.01)
    x = x.reshape(x.shape[0], -1)
    return equal_linear(p["linear"], x)


def _upsample_add(x: Array, y: Array) -> Array:
    """bilinear align_corners resize of x to y's HW, then add (helpers.py:134-151)."""
    up = resize(x, (y.shape[1], y.shape[2]), "bilinear", align_corners=True)
    return up + y


# Head groups by FPN source (psp_encoders.py:146-151): coarse 0-2 from c3,
# middle 3-6 from p2, fine 7.. from p1. Heads within a group share their
# input feature map and conv-chain length (same `spatial`).
_GROUP_BOUNDS = (0, 3, 7)


def _head_groups(n_styles: int):
    bounds = list(_GROUP_BOUNDS) + [n_styles]
    return [(min(a, n_styles), min(b, n_styles))
            for a, b in zip(bounds[:-1], bounds[1:])]


def pack_style_heads(p):
    """Pack the per-layer GradualStyleBlocks into consolidated ops (exact).

    Heads in one FPN group read the SAME feature map, so their first 3x3
    convs concatenate along the output axis into one dense conv; the
    remaining per-head 512->512 convs become shift-slice batched matmuls;
    the final EqualLinears become one stacked einsum.

    MEASURED SLOWER on v5e (B=3, ms/call: 5.2 unpacked -> 7.1 as
    feature_group_count convs -> 7.9 as einsum chains) — XLA pipelines the
    98 small independent convs better than either consolidated form. Kept
    as an equality-tested experiment hook (zoo.pack_zoo is opt-in, not the
    api/bench default). Idempotent; `e4e_encode`/`gradual_style_encode`
    dispatch on the packed layout.
    """
    if "styles_packed" in p or "styles" not in p:
        return p
    styles = p["styles"]
    packed = []
    for a, b in _head_groups(len(styles)):
        heads = styles[a:b]
        if not heads:
            continue
        # first conv: shared input -> ONE dense conv with concatenated
        # output channels; chain convs: per-head weights stacked [k,3,3,c,o]
        # for the shift-slice einsum (feature_group_count convs lower badly
        # on this toolchain: measured 5.2 -> 7.1 ms/call at B=3)
        g = {"conv0": {
                "w": jnp.concatenate([h["convs"][0]["w"] for h in heads], -1),
                "b": jnp.concatenate([h["convs"][0]["b"] for h in heads], -1)},
             "chain": [
                 {"w": jnp.stack([h["convs"][i]["w"] for h in heads]),
                  "b": jnp.stack([h["convs"][i]["b"] for h in heads])}
                 for i in range(1, len(heads[0]["convs"]))],
             "lin_w": jnp.stack([h["linear"]["w"] for h in heads]),
             "lin_b": jnp.stack([h["linear"]["b"] for h in heads])}
        packed.append(g)
    q = {k: v for k, v in p.items() if k != "styles"}
    q["styles_packed"] = packed
    return q


def _headwise_conv(x: Array, w: Array, b: Array, stride: int = 2) -> Array:
    """Per-head 3x3 stride-2 conv as 9 shift-slice batched matmuls.

    x [B,H,W,k,c]; w [k,3,3,c,o]; b [k,o] -> [B,Ho,Wo,k,o]. Each tap (u,v)
    contributes einsum('bhwkc,kco->bhwko') on a strided slice — k rides the
    matmul batch dim, M = B*Ho*Wo, K=c, N=o (MXU-shaped), and XLA fuses the
    9 adds. Exactly a feature_group_count=k conv, without its bad lowering.
    """
    bsz, h, wd, k, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    ho = (h + 2 - 3) // stride + 1
    wo = (wd + 2 - 3) // stride + 1
    wt = w.astype(x.dtype)
    out = None
    for u in range(3):
        for v in range(3):
            xs = jax.lax.slice(
                xp, (0, u, v, 0, 0),
                (bsz, u + (ho - 1) * stride + 1, v + (wo - 1) * stride + 1, k, c),
                (1, stride, stride, 1, 1))
            t = jnp.einsum("bhwkc,kco->bhwko", xs, wt[:, u, v],
                           preferred_element_type=x.dtype)
            out = t if out is None else out + t
    return out + b.astype(x.dtype)


def _packed_head_group(g, x: Array) -> Array:
    """One packed group: [B,H,W,Cin] -> [B,k,512] head outputs."""
    k = g["lin_w"].shape[0]
    x = leaky_relu(conv2d_p(g["conv0"], x, stride=2, padding=1), 0.01)
    x = x.reshape(x.shape[:3] + (k, x.shape[-1] // k))
    for c in g["chain"]:
        x = leaky_relu(_headwise_conv(x, c["w"], c["b"]), 0.01)
    x = x.reshape(x.shape[0], k, -1)  # spatial is 1x1 here
    scale = 1.0 / math.sqrt(g["lin_w"].shape[1])
    w = g["lin_w"].astype(x.dtype) * jnp.asarray(scale, x.dtype)
    return (jnp.einsum("bkc,kcd->bkd", x, w, preferred_element_type=x.dtype)
            + g["lin_b"].astype(x.dtype))


def _all_style_latents(p, c1: Array, c2: Array, c3: Array) -> Array:
    """All n_styles head outputs stacked [B,n,512] (before any combination)."""
    if "styles_packed" in p:
        n_groups = len(p["styles_packed"])
        feats = [c3]
        if n_groups > 1:
            feats.append(_upsample_add(c3, conv2d_p(p["latlayer1"], c2)))
        if n_groups > 2:
            feats.append(_upsample_add(feats[1], conv2d_p(p["latlayer2"], c1)))
        return jnp.concatenate(
            [_packed_head_group(g, f)
             for g, f in zip(p["styles_packed"], feats)], axis=1)
    n = len(p["styles"])
    latents = [gradual_style_block(p["styles"][j], c3)
               for j in range(min(3, n))]
    if n > 3:
        p2 = _upsample_add(c3, conv2d_p(p["latlayer1"], c2))
        latents += [gradual_style_block(p["styles"][j], p2)
                    for j in range(3, min(7, n))]
        if n > 7:
            p1 = _upsample_add(p2, conv2d_p(p["latlayer2"], c1))
            latents += [gradual_style_block(p["styles"][j], p1)
                        for j in range(7, n)]
    return jnp.stack(latents, axis=1)


def init_e4e(key, n_styles: int = 18, se: bool = True, width: float = 1.0):
    """width < 1 scales the trunk/FPN/head-mid channels (micro test zoos);
    the W+ output stays [B, n_styles, 512] (latent ABI)."""
    c = lambda n: max(16, int(n * width))
    keys = jax.random.split(key, n_styles + 4)
    styles = []
    for i in range(n_styles):
        spatial = 16 if i < 3 else (32 if i < 7 else 64)
        styles.append(init_gradual_style_block(keys[i], c(512), 512, spatial,
                                               mid=c(512)))
    return {
        "backbone": init_irse_body(keys[n_styles], se=se, width=width),
        "styles": styles,
        "latlayer1": init_conv(keys[n_styles + 1], 1, c(256), c(512)),
        "latlayer2": init_conv(keys[n_styles + 2], 1, c(128), c(512)),
        "latent_avg": jnp.zeros((n_styles, 512), jnp.float32),
    }


def gradual_style_encode(p, x: Array, add_latent_avg: bool = True) -> Array:
    """pSp GradualStyleEncoder variant (psp_encoders.py:57-123): independent
    per-layer styles from the FPN (coarse 0-2 from c3, middle 3-6 from p2,
    fine 7.. from p1) — no w0 broadcast/deltas. Same parameter tree as
    Encoder4Editing (init_e4e)."""
    c1, c2, c3 = irse_pyramid(p["backbone"], x)
    w = _all_style_latents(p, c1, c2, c3)
    if add_latent_avg:
        w = w + p["latent_avg"].astype(w.dtype)[None]
    return w


@jax.named_scope("e4e")
def e4e_encode(p, x: Array, add_latent_avg: bool = True) -> Array:
    """x: [B,256,256,3] normalized ([-1,1]) -> W+ [B,18,512].

    Inference stage (psp_encoders.py:187-200): w0 broadcast + per-layer FPN
    deltas for i in 1..17, then + latent_avg (model_utils.py:7-14).
    """
    c1, c2, c3 = irse_pyramid(p["backbone"], x)
    lat = _all_style_latents(p, c1, c2, c3)  # [B, n, 512]: w0 then deltas
    w = jnp.tile(lat[:, :1], (1, lat.shape[1], 1))
    w = w.at[:, 1:].add(lat[:, 1:])
    if add_latent_avg:
        w = w + p["latent_avg"].astype(w.dtype)[None]
    return w
