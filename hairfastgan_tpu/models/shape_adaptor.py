"""CtrlHair shape adaptor (mask autoencoder), TPU-native NHWC.

Rebuilds the live subset of reference models/CtrlHair/shape_branch/:
  * positional encoding table (model.py:19-33): sin/cos of 2-D coords at
    `order` octaves -> 4*order channels, precomputed as a constant
  * MaskEncoder (model.py:69-113): 7 stride-2 Conv2dBlocks (LayerNorm
    'ln' + lrelu 0.2) + Linear head; hair encoder is a VAE whose test
    path returns the mean (solver.py:248-256 uses testing=True)
  * MaskDecoder (model.py:116-143): Linear -> 7x (nearest up x2 + conv
    3x3 LN lrelu) -> conv 3x3
  * recombination (model.py:186-199): face logits (18ch) + hair logit
    (1ch) interleaved at HAIR_IDX=13, softmax over 19

The 'ln' norm is CtrlHair's custom per-sample LayerNorm over (C,H,W) with
torch's *unbiased* std and per-channel affine (my_torchlib/module.py:177-205)
— note std not var, so eps adds to std.

API mirrors solver.py:248-262: codes from 256^2 19-label masks, decode to a
new 256^2 label mask.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.models.layers import init_conv, init_linear
from hairfastgan_tpu.ops.basic import conv2d_p, leaky_relu, linear
from hairfastgan_tpu.ops.segops import one_hot_mask

Array = jax.Array

HAIR_IDX = 13
N_CLASSES = 19
INPUT_SIZE = 256
LAYER_NUM = 7
HAIR_DIM = 16
FACE_DIM = 1024
POS_ORDER = 10


@functools.lru_cache(maxsize=None)
def pos_embedding(img_size: int = INPUT_SIZE, order: int = POS_ORDER) -> np.ndarray:
    """[H, W, 4*order] positional table (model.py:19-33), NHWC layout.

    Channel order matches the torch reshape of [2*order, 2, H, W] ->
    [4*order, H, W]: sin(f0*y), sin(f0*x), sin(f1*y)... then cos likewise
    (np.meshgrid(c, c) gives [x-grid, y-grid] stacked on axis 0; gamma
    reshape interleaves coord fastest).
    """
    coords = np.linspace(0, 1, img_size, endpoint=False)
    xg, yg = np.meshgrid(coords, coords)  # both [H, W]
    bi = np.stack([xg, yg], 0)[None]  # [1, 2, H, W]
    freqs = (2.0 ** np.arange(order) * np.pi)[:, None, None, None]
    gamma = np.concatenate([np.sin(freqs * bi), np.cos(freqs * bi)], axis=0)
    gamma = gamma.reshape(-1, img_size, img_size)  # [4*order, H, W]
    return np.transpose(gamma, (1, 2, 0)).astype(np.float32)


def ctrlhair_layer_norm(p, x: Array, eps: float = 1e-5) -> Array:
    """Per-sample norm over all non-batch dims, unbiased std, channel affine."""
    xf = x.astype(jnp.float32)
    flat = xf.reshape(x.shape[0], -1)
    mean = jnp.mean(flat, axis=1)
    n = flat.shape[1]
    var = jnp.var(flat, axis=1) * (n / max(n - 1, 1))
    std = jnp.sqrt(var)
    shape = (-1,) + (1,) * (x.ndim - 1)
    y = (xf - mean.reshape(shape)) / (std.reshape(shape) + eps)
    y = y * p["gamma"].astype(jnp.float32) + p["beta"].astype(jnp.float32)
    return y.astype(x.dtype)


def _enc_channels(hidden: int = 32):
    return [min(2048, hidden * 2 ** i) for i in range(LAYER_NUM)]


def init_mask_encoder(key, in_ch: int, out_dim: int, vae: bool = False,
                      hidden: int = 32):
    chans = _enc_channels(hidden)
    keys = jax.random.split(key, LAYER_NUM + 2)
    layers = []
    cin = in_ch + 4 * POS_ORDER
    for i, cout in enumerate(chans):
        layers.append({
            "conv": init_conv(keys[i], 4, cin, cout),
            "ln": {"gamma": jax.random.uniform(keys[i], (cout,)),
                   "beta": jnp.zeros((cout,), jnp.float32)},
        })
        cin = cout
    out_size = INPUT_SIZE // 2 ** LAYER_NUM
    fc_in = out_size * out_size * chans[-1]
    p = {"layers": layers, "out": init_linear(keys[LAYER_NUM], fc_in, out_dim)}
    if vae:
        p["std_out"] = init_linear(keys[LAYER_NUM + 1], fc_in, out_dim)
    return p


def mask_encode(p, mask: Array) -> Array:
    """mask [B,256,256,in_ch] one-hot -> mean code [B,out_dim] (test path)."""
    pos = jnp.asarray(pos_embedding(), mask.dtype)
    x = jnp.concatenate([mask, jnp.tile(pos[None], (mask.shape[0], 1, 1, 1))], -1)
    for l in p["layers"]:
        x = conv2d_p(l["conv"], x, stride=2, padding=1)
        x = leaky_relu(ctrlhair_layer_norm(l["ln"], x), 0.2)
    # torch flatten is channel-major (NCHW)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    return linear(p["out"], x)


def init_mask_decoder(key, in_dim: int, out_ch: int, hidden: int = 32):
    in_channel = min(hidden * 2 ** LAYER_NUM, 2048)
    in_size = INPUT_SIZE // 2 ** LAYER_NUM
    keys = jax.random.split(key, LAYER_NUM + 2)
    layers = []
    cin = in_channel
    for i in range(LAYER_NUM):
        cout = min(hidden * 2 ** (LAYER_NUM - 1 - i), 2048)
        layers.append({
            "conv": init_conv(keys[i], 3, cin, cout),
            "ln": {"gamma": jax.random.uniform(keys[i], (cout,)),
                   "beta": jnp.zeros((cout,), jnp.float32)},
        })
        cin = cout
    return {
        "in": init_linear(keys[LAYER_NUM], in_dim, in_channel * in_size ** 2),
        "layers": layers,
        "out": init_conv(keys[LAYER_NUM + 1], 3, cin, out_ch),
    }


def mask_decode(p, code: Array) -> Array:
    x = linear(p["in"], code)
    # torch reshape(-1, C, H, W): channel-major; geometry from weight shapes
    in_channel = p["layers"][0]["conv"]["w"].shape[2]
    in_size = int((x.shape[-1] // in_channel) ** 0.5)
    x = x.reshape(-1, in_channel, in_size, in_size)
    x = jnp.transpose(x, (0, 2, 3, 1))
    for l in p["layers"]:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
        x = conv2d_p(l["conv"], x, padding=1)
        x = leaky_relu(ctrlhair_layer_norm(l["ln"], x), 0.2)
    return conv2d_p(p["out"], x, padding=1)


def init_shape_adaptor(key, hidden: int = 32):
    """hidden < 32 scales the conv widths (micro test zoos); the code dims
    (hair 16 / face 1024) and 256^2 mask space are the CtrlHair ABI."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "hair_encoder": init_mask_encoder(k1, 1, HAIR_DIM, vae=True, hidden=hidden),
        "face_encoder": init_mask_encoder(k2, N_CLASSES - 1, FACE_DIM, hidden=hidden),
        "hair_decoder": init_mask_decoder(k3, FACE_DIM + HAIR_DIM, 1, hidden=hidden),
        "face_decoder": init_mask_decoder(k4, FACE_DIM, N_CLASSES - 1, hidden=hidden),
    }


def get_face_code(p, labels256: Array) -> Array:
    """labels [B,256,256] -> face code [B,1024] (18 non-hair channels)."""
    onehot = one_hot_mask(labels256, N_CLASSES)
    face = jnp.concatenate([onehot[..., :HAIR_IDX], onehot[..., HAIR_IDX + 1:]], -1)
    return mask_encode(p["face_encoder"], face)


def get_hair_code(p, labels256: Array) -> Array:
    """labels [B,256,256] -> hair code [B,16] (VAE mean, test path)."""
    onehot = one_hot_mask(labels256, N_CLASSES)
    return mask_encode(p["hair_encoder"], onehot[..., HAIR_IDX:HAIR_IDX + 1])


@jax.named_scope("shape_adaptor_enc")
def get_hair_face_code(p, labels256: Array) -> Tuple[Array, Array]:
    """labels [B,256,256] int -> (face_code [B,1024], hair_code [B,16]).

    Mirrors solver.py:248-256: one-hot 19, split at HAIR_IDX, encode both.
    The pipeline uses the split functions above — it needs only the face
    code of one mask and the hair code of the other (Alignment.py:74-77
    computes both for each mask and discards half).
    """
    return get_face_code(p, labels256), get_hair_code(p, labels256)


@jax.named_scope("shape_adaptor_dec")
def get_new_shape(p, face_code: Array, hair_code: Array) -> Array:
    """codes -> recombined 19-class label mask [B,256,256] (solver.py:259-262)."""
    hair_logit = mask_decode(p["hair_decoder"],
                             jnp.concatenate([face_code, hair_code], -1))
    face_logit = mask_decode(p["face_decoder"], face_code)
    logit = jnp.concatenate([face_logit[..., :HAIR_IDX], hair_logit,
                             face_logit[..., HAIR_IDX:]], -1)
    # softmax then argmax == argmax of logits (model.py:196-199 + argmax)
    return jnp.argmax(logit, axis=-1).astype(jnp.int32)


def get_new_shape_shared_face(p, face_code: Array, hair_code: Array) -> Array:
    """`get_new_shape` for k hair codes per face code: [B,1024] x [k*B,16].

    The face decoder runs ONCE at B and its logits are tiled — exact, since
    face_logit depends only on face_code (solver.py:259-262 recombination).
    Used when one face's mask is recombined with several rotated hair masks
    (the shape- and color-pair shape modules of one swap, hair_swap.py:49-57).
    """
    k = hair_code.shape[0] // face_code.shape[0]
    hair_logit = mask_decode(p["hair_decoder"], jnp.concatenate(
        [jnp.tile(face_code, (k, 1)), hair_code], -1))
    face_logit = jnp.tile(mask_decode(p["face_decoder"], face_code), (k, 1, 1, 1))
    logit = jnp.concatenate([face_logit[..., :HAIR_IDX], hair_logit,
                             face_logit[..., HAIR_IDX:]], -1)
    return jnp.argmax(logit, axis=-1).astype(jnp.int32)
