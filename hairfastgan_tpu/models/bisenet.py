"""BiSeNet face parser (19- and 16-class variants), TPU-native NHWC.

Rebuilds reference models/face_parsing/{model,resnet}.py (identical twin at
models/CtrlHair/external_code/face_parsing/model.py): ResNet-18 context
path, AttentionRefinementModules on the 1/16 and 1/32 features, global
context head, FeatureFusionModule against the 1/8 feature, and a 3x3+1x1
output head bilinearly upsampled (align_corners=True) to the input size.

Inference emits only the main head (the reference discards out16/out32 at
inference; my_parsing_util.py:84-87); training uses all three.

Label conventions carried over:
  * 19-class CelebAMask order after `swap_parsing_label_to_celeba_mask`
    remap: hair = 13 (global_value_utils.py:49-52)
  * 16-class `seg.pth` variant: hair = 10 (scripts/pp_train.py:94)
  * input normalization mean/std (0.485,0.456,0.406)/(0.229,0.224,0.225)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.layers import Static, init_bn, init_conv, init_conv_bn
from hairfastgan_tpu.ops.basic import (
    avg_pool_global,
    batch_norm,
    conv2d_p,
    max_pool,
    relu,
    sigmoid,
)
from hairfastgan_tpu.ops.resample import resize

Array = jax.Array

SEG_MEAN = (0.485, 0.456, 0.406)
SEG_STD = (0.229, 0.224, 0.225)

# CelebAMask-HQ label order used pipeline-wide (19-class variant)
CELEBA_HAIR = 13
SEG16_HAIR = 10

# BiSeNet-19 raw output order -> CelebAMask order permutation:
# celeba[i] = raw[PERM[i]], derived from the name-matching loop in
# swap_parsing_label_to_celeba_mask (my_parsing_util.py:90-95) between the
# parser's label_list (my_parsing_util.py:61-65) and PARSING_LABEL_LIST
# (global_value_utils.py:49-51). hair: raw 17 -> celeba 13.
FACE_PARSING_TO_CELEBA = (0, 1, 10, 6, 4, 5, 2, 3, 7, 8, 11, 12, 13, 17, 18, 9, 15, 14, 16)


def to_bisenet_input(img01: Array) -> Array:
    """[0,1] RGB NHWC -> normalized parser input."""
    mean = jnp.asarray(SEG_MEAN, img01.dtype)
    std = jnp.asarray(SEG_STD, img01.dtype)
    return (img01 - mean) / std


def init_basic_block(key, cin: int, cout: int, stride: int):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv_bn(k1, 3, cin, cout),
        "conv2": init_conv_bn(k2, 3, cout, cout),
        "stride": Static(stride),
    }
    if cin != cout or stride != 1:
        p["downsample"] = init_conv_bn(k3, 1, cin, cout)
    return p


def basic_block(p, x: Array) -> Array:
    s = p["stride"].value
    r = relu(batch_norm(p["conv1"]["bn"], conv2d_p(p["conv1"]["conv"], x, stride=s, padding=1)))
    r = batch_norm(p["conv2"]["bn"], conv2d_p(p["conv2"]["conv"], r, padding=1))
    short = x
    if "downsample" in p:
        short = batch_norm(p["downsample"]["bn"], conv2d_p(p["downsample"]["conv"], x, stride=s))
    return relu(short + r)


def init_resnet18(key, width: float = 1.0):
    c = lambda n: max(16, int(n * width))
    keys = iter(jax.random.split(key, 16))
    layers = {}
    layers["conv1"] = init_conv_bn(next(keys), 7, 3, c(64))
    chans = [(c(64), c(64), 1), (c(64), c(128), 2), (c(128), c(256), 2),
             (c(256), c(512), 2)]
    for i, (cin, cout, s) in enumerate(chans, start=1):
        layers[f"layer{i}"] = [
            init_basic_block(next(keys), cin, cout, s),
            init_basic_block(next(keys), cout, cout, 1),
        ]
    return layers


def resnet18_features(p, x: Array) -> Tuple[Array, Array, Array]:
    x = relu(batch_norm(p["conv1"]["bn"], conv2d_p(p["conv1"]["conv"], x, stride=2, padding=3)))
    x = max_pool(x, 3, 2, padding=1)
    for b in p["layer1"]:
        x = basic_block(b, x)
    f8 = x
    for b in p["layer2"]:
        f8 = basic_block(b, f8)
    f16 = f8
    for b in p["layer3"]:
        f16 = basic_block(b, f16)
    f32 = f16
    for b in p["layer4"]:
        f32 = basic_block(b, f32)
    return f8, f16, f32


def init_arm(key, cin: int, cout: int):
    k1, k2 = jax.random.split(key)
    return {
        "conv": init_conv_bn(k1, 3, cin, cout),
        "atten": init_conv(k2, 1, cout, cout, bias=False),
        "bn_atten": init_bn(cout),
    }


def arm(p, x: Array) -> Array:
    feat = relu(batch_norm(p["conv"]["bn"], conv2d_p(p["conv"]["conv"], x, padding=1)))
    a = avg_pool_global(feat)
    a = sigmoid(batch_norm(p["bn_atten"], conv2d_p(p["atten"], a)))
    return feat * a


def init_ffm(key, cin: int, cout: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "convblk": init_conv_bn(k1, 1, cin, cout),
        "conv1": init_conv(k2, 1, cout, cout // 4, bias=False),
        "conv2": init_conv(k3, 1, cout // 4, cout, bias=False),
    }


def ffm(p, fsp: Array, fcp: Array) -> Array:
    feat = relu(batch_norm(p["convblk"]["bn"],
                           conv2d_p(p["convblk"]["conv"],
                                    jnp.concatenate([fsp, fcp], axis=-1))))
    a = avg_pool_global(feat)
    a = sigmoid(conv2d_p(p["conv2"], relu(conv2d_p(p["conv1"], a))))
    return feat * a + feat


def init_head(key, cin: int, mid: int, n_classes: int):
    k1, k2 = jax.random.split(key)
    return {
        "conv": init_conv_bn(k1, 3, cin, mid),
        "out": init_conv(k2, 1, mid, n_classes, bias=False),
    }


def head(p, x: Array) -> Array:
    y = relu(batch_norm(p["conv"]["bn"], conv2d_p(p["conv"]["conv"], x, padding=1)))
    return conv2d_p(p["out"], y)


def init_bisenet(key, n_classes: int = 19, width: float = 1.0):
    """width < 1 scales every INTERNAL channel count (micro test zoos);
    the external contract (512-space input, n_classes logits) is fixed."""
    c = lambda n: max(16, int(n * width))
    keys = jax.random.split(key, 9)
    return {
        "resnet": init_resnet18(keys[0], width),
        "arm16": init_arm(keys[1], c(256), c(128)),
        "arm32": init_arm(keys[2], c(512), c(128)),
        "conv_head32": init_conv_bn(keys[3], 3, c(128), c(128)),
        "conv_head16": init_conv_bn(keys[4], 3, c(128), c(128)),
        "conv_avg": init_conv_bn(keys[5], 1, c(512), c(128)),
        "ffm": init_ffm(keys[6], c(128) * 2, c(256)),
        "head": init_head(keys[7], c(256), c(256), n_classes),
        "head16": init_head(keys[8], c(128), c(64), n_classes),
        "head32": init_head(jax.random.split(keys[8])[0], c(128), c(64),
                            n_classes),
        "n_classes": Static(n_classes),
    }


@jax.named_scope("bisenet")
def bisenet_logits(p, x: Array, aux: bool = False):
    """x: normalized NHWC -> main logits [B,H,W,K] (+ aux heads if aux)."""
    h, w = x.shape[1], x.shape[2]
    f8, f16, f32 = resnet18_features(p["resnet"], x)

    avg = relu(batch_norm(p["conv_avg"]["bn"], conv2d_p(p["conv_avg"]["conv"],
                                                        avg_pool_global(f32))))
    f32_sum = arm(p["arm32"], f32) + avg  # broadcast of 1x1 global ctx
    f32_up = resize(f32_sum, (f16.shape[1], f16.shape[2]), "nearest")
    f32_up = relu(batch_norm(p["conv_head32"]["bn"],
                             conv2d_p(p["conv_head32"]["conv"], f32_up, padding=1)))

    f16_sum = arm(p["arm16"], f16) + f32_up
    f16_up = resize(f16_sum, (f8.shape[1], f8.shape[2]), "nearest")
    f16_up = relu(batch_norm(p["conv_head16"]["bn"],
                             conv2d_p(p["conv_head16"]["conv"], f16_up, padding=1)))

    fused = ffm(p["ffm"], f8, f16_up)
    out = resize(head(p["head"], fused), (h, w), "bilinear", align_corners=True)
    if not aux:
        return out
    out16 = resize(head(p["head16"], f16_up), (h, w), "bilinear", align_corners=True)
    out32 = resize(head(p["head32"], f32_up), (h, w), "bilinear", align_corners=True)
    return out, out16, out32


def parse_to_celeba(p, img01: Array) -> Array:
    """[0,1] NHWC image -> int labels [B,H,W] in CelebAMask order.

    Equivalent to FaceParsing_tensor.parsing_img +
    swap_parsing_label_to_celeba_mask (my_parsing_util.py:72-95): argmax over
    raw classes then label remap, done here as a channel permutation before
    argmax (identical result, no gather over pixels).
    """
    logits = bisenet_logits(p, to_bisenet_input(img01))
    perm = jnp.asarray(FACE_PARSING_TO_CELEBA)
    return jnp.argmax(logits[..., perm], axis=-1).astype(jnp.int32)


def segment_256(p, img01_512: Array) -> Array:
    """512-res parse -> 256 nearest-resized labels (reference Net.py:108-115)."""
    labels = parse_to_celeba(p, img01_512)
    lab = labels[..., None].astype(jnp.float32)
    out = resize(lab, (256, 256), "nearest")
    return out[..., 0].astype(jnp.int32)
