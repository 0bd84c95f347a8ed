"""SEAN per-region style encoder + SPADE/ACE generator, TPU-native NHWC.

Rebuilds the live subset of reference models/sean_codes/ used by the
pipeline (pix2pix_model.py:299-339 encode_sean/decode_sean):
  * Zencoder (architecture.py:154-207): conv bottleneck -> [B,128,128,512]
    code map -> per-region masked average -> [B,19,512]
  * ACE/SPADE (normalization.py:70-257): per-region style broadcast
    gamma/beta blended with plain SPADE gamma/beta via learned sigmoid
    gates; per-channel noise; BatchNorm (running stats) as the
    parameter-free norm
  * SPADEResnetBlock + SPADEGenerator 256^2 'normal' config
    (generator.py:14-109)

The reference's double python loop over (batch, region) with
masked_scatter_ becomes two einsums (ops/segops.py) — dense MXU work with
no host round trips. Spectral norm is baked into the conv weights at
conversion time (W/sigma(W)); at inference both are mathematically equal.

Region-empty fallback of decode_sean (pix2pix_model.py:274-325): style
codes that are exactly zero for a region are replaced by precomputed mean
codes [19,512] folded in as a constant.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.layers import init_bn, init_conv, init_linear
from hairfastgan_tpu.ops.basic import (
    batch_norm,
    conv2d,
    conv2d_p,
    instance_norm,
    leaky_relu,
    linear,
    relu,
    sigmoid,
    tanh,
)
from hairfastgan_tpu.ops.resample import resize
from hairfastgan_tpu.ops.segops import one_hot_mask, region_mean

Array = jax.Array

N_REGIONS = 19
STYLE_LEN = 512


# ---------------------------------------------------------------------------
# Zencoder
# ---------------------------------------------------------------------------

def init_zencoder(key, ngf: int = 32):
    keys = jax.random.split(key, 5)
    return {
        "conv_in": init_conv(keys[0], 3, 3, ngf),
        "down1": init_conv(keys[1], 3, ngf, ngf * 2),
        "down2": init_conv(keys[2], 3, ngf * 2, ngf * 4),
        # ConvTranspose(128->256, k3 s2 p1 outpad1) pre-converted to forward
        # (flipped HWIO) form by the converter
        "up": init_conv(keys[3], 3, ngf * 4, ngf * 8),
        "conv_out": init_conv(keys[4], 3, ngf * 8, STYLE_LEN),
    }


def _reflect_pad(x: Array, p: int = 1) -> Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def zencoder_codes(p, img: Array, seg_onehot: Array) -> Array:
    """img [B,256,256,3] in [-1,1], seg_onehot [B,256,256,19] -> [B,19,512]."""
    x = conv2d_p(p["conv_in"], _reflect_pad(img))
    x = leaky_relu(instance_norm(x), 0.2)
    x = conv2d_p(p["down1"], x, stride=2, padding=1)
    x = leaky_relu(instance_norm(x), 0.2)
    x = conv2d_p(p["down2"], x, stride=2, padding=1)
    x = leaky_relu(instance_norm(x), 0.2)
    # transposed conv k3 s2 p1 outpad1: lhs-dilated conv, pad (1,2) each axis
    x = conv2d(x, p["up"]["w"], p["up"].get("b"),
               padding=[(1, 2), (1, 2)], lhs_dilation=2)
    x = leaky_relu(instance_norm(x), 0.2)
    x = tanh(conv2d_p(p["conv_out"], _reflect_pad(x)))  # [B,128,128,512]

    seg_small = resize(seg_onehot, (x.shape[1], x.shape[2]), "nearest")
    return region_mean(x, seg_small)


# ---------------------------------------------------------------------------
# SPADE / ACE
# ---------------------------------------------------------------------------

def init_spade(key, norm_nc: int, label_nc: int = N_REGIONS, nhidden: int = 128):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "shared": init_conv(k1, 3, label_nc, nhidden),
        "gamma": init_conv(k2, 3, nhidden, norm_nc),
        "beta": init_conv(k3, 3, nhidden, norm_nc),
    }


def spade_gamma_beta(p, seg: Array) -> Tuple[Array, Array]:
    a = relu(conv2d_p(p["shared"], seg, padding=1))
    if "gb" in p:  # packed: one conv with [gamma|beta] output channels
        gb = conv2d_p(p["gb"], a, padding=1)
        g, b = jnp.split(gb, 2, axis=-1)
        return g, b
    return conv2d_p(p["gamma"], a, padding=1), conv2d_p(p["beta"], a, padding=1)


def init_ace(key, norm_nc: int, use_rgb: bool = True):
    keys = jax.random.split(key, 4 + N_REGIONS)
    p = {
        "spade": init_spade(keys[0], norm_nc),
        "bn": init_bn(norm_nc),  # affine-free: converter sets gamma=1, beta=0
        "noise_var": jnp.zeros((norm_nc,), jnp.float32),
    }
    if use_rgb:
        p["blend_gamma"] = jnp.zeros((), jnp.float32)
        p["blend_beta"] = jnp.zeros((), jnp.float32)
        p["fc_mu"] = [init_linear(keys[4 + j], STYLE_LEN, STYLE_LEN)
                      for j in range(N_REGIONS)]
        p["conv_gamma"] = init_conv(keys[1], 3, STYLE_LEN, norm_nc)
        p["conv_beta"] = init_conv(keys[2], 3, STYLE_LEN, norm_nc)
    return p


def _region_conv(conv_p, mu: Array, seg: Array) -> Array:
    """conv3x3(region_broadcast(mu)) without materializing the broadcast.

    conv_p: {'w': [3,3,C,O], 'b': [O]}; mu [B,K,C]; seg one-hot [B,H,W,K].
    """
    w = conv_p["w"].astype(mu.dtype)
    proj = jnp.einsum("bkc,uvco->bkuvo", mu, w,
                      preferred_element_type=mu.dtype)  # [B,K,3,3,O]
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = kh // 2, kw // 2
    segp = jnp.pad(seg, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    h, wdt = seg.shape[1], seg.shape[2]
    out = None
    for u in range(kh):
        for v in range(kw):
            shifted = segp[:, u:u + h, v:v + wdt, :]
            t = jnp.einsum("bhwk,bko->bhwo", shifted, proj[:, :, u, v, :],
                           preferred_element_type=mu.dtype)
            out = t if out is None else out + t
    if "b" in conv_p:
        out = out + conv_p["b"].astype(mu.dtype)
    return out


def ace(p, x: Array, seg_onehot: Array, style_codes: Optional[Array],
        noise_key: Optional[Array] = None) -> Array:
    """ACE forward (normalization.py:108-191) on NHWC.

    x [B,H,W,C]; seg_onehot [B,256,256,19]; style_codes [B,19,512] or None.
    noise_key None -> zero noise (deterministic); reference draws fresh
    gaussian per call scaled by the learned per-channel noise_var.
    """
    if noise_key is not None:
        z = jax.random.normal(noise_key, (x.shape[0], x.shape[1], x.shape[2], 1),
                              x.dtype)
        x = x + z * p["noise_var"].astype(x.dtype)
    normalized = batch_norm(p["bn"], x)

    seg = resize(seg_onehot, (x.shape[1], x.shape[2]), "nearest")
    gamma_spade, beta_spade = spade_gamma_beta(p["spade"], seg)

    has_rgb = ("fc_mu" in p) or ("fc_mu_w" in p)
    if has_rgb and style_codes is not None:
        # per-region fc_mu + relu: one stacked matmul [B,19,512]x[19,512,512]
        if "fc_mu_w" in p:  # packed at zoo load — no per-call stack traffic
            w, b = p["fc_mu_w"], p["fc_mu_b"]
        else:
            w = jnp.stack([f["w"] for f in p["fc_mu"]])  # [19, 512, 512]
            b = jnp.stack([f["b"] for f in p["fc_mu"]])  # [19, 512]
        mu = relu(jnp.einsum("bks,ksd->bkd", style_codes.astype(x.dtype),
                             w.astype(x.dtype),
                             preferred_element_type=x.dtype) + b.astype(x.dtype))
        # conv3x3(region_broadcast(mu)) reordered: the conv is linear, and
        # the broadcast map is sum_k onehot_k (x) mu_k, so project the conv
        # taps onto mu FIRST (proj[b,k,u,v,o] = sum_c W[u,v,c,o] mu[b,k,c])
        # and accumulate 9 shifted [B,H,W,19]x[B,19,O] einsums. Exactly the
        # reference math (normalization.py:172-173) with 512/19 ~ 27x fewer
        # MACs and no [B,H,W,512] intermediate in HBM.
        if "conv_gb" in p:  # packed: gamma|beta share the 9 shifted einsums
            gb = _region_conv(p["conv_gb"], mu, seg)
            gamma_avg, beta_avg = jnp.split(gb, 2, axis=-1)
        else:
            gamma_avg = _region_conv(p["conv_gamma"], mu, seg)
            beta_avg = _region_conv(p["conv_beta"], mu, seg)
        ga = sigmoid(p["blend_gamma"]).astype(x.dtype)
        ba = sigmoid(p["blend_beta"]).astype(x.dtype)
        gamma = ga * gamma_avg + (1 - ga) * gamma_spade
        beta = ba * beta_avg + (1 - ba) * beta_spade
    else:
        gamma, beta = gamma_spade, beta_spade

    return normalized * (1 + gamma) + beta


# ---------------------------------------------------------------------------
# SPADEResnetBlock + generator
# ---------------------------------------------------------------------------

def init_spade_block(key, fin: int, fout: int, use_rgb: bool = True):
    fmid = min(fin, fout)
    keys = jax.random.split(key, 6)
    p = {
        "ace0": init_ace(keys[0], fin, use_rgb),
        "conv0": init_conv(keys[1], 3, fin, fmid),
        "ace1": init_ace(keys[2], fmid, use_rgb),
        "conv1": init_conv(keys[3], 3, fmid, fout),
    }
    if fin != fout:
        p["ace_s"] = init_ace(keys[4], fin, use_rgb)
        p["conv_s"] = init_conv(keys[5], 1, fin, fout, bias=False)
    return p


def spade_block(p, x, seg_onehot, style_codes, keys=None) -> Array:
    k0 = k1 = ks = None
    if keys is not None:
        k0, k1, ks = jax.random.split(keys, 3)
    if "conv_s" in p:
        xs = conv2d_p(p["conv_s"], ace(p["ace_s"], x, seg_onehot, style_codes, ks))
    else:
        xs = x
    dx = ace(p["ace0"], x, seg_onehot, style_codes, k0)
    dx = conv2d_p(p["conv0"], leaky_relu(dx, 0.2), padding=1)
    dx = ace(p["ace1"], dx, seg_onehot, style_codes, k1)
    dx = conv2d_p(p["conv1"], leaky_relu(dx, 0.2), padding=1)
    return xs + dx


def init_sean_generator(key, ngf: int = 64, z_ngf: int = 32):
    keys = jax.random.split(key, 10)
    return {
        "zencoder": init_zencoder(keys[0], ngf=z_ngf),
        "fc": init_conv(keys[1], 3, N_REGIONS, 16 * ngf),
        "head0": init_spade_block(keys[2], 16 * ngf, 16 * ngf),
        "mid0": init_spade_block(keys[3], 16 * ngf, 16 * ngf),
        "mid1": init_spade_block(keys[4], 16 * ngf, 16 * ngf),
        "up0": init_spade_block(keys[5], 16 * ngf, 8 * ngf),
        "up1": init_spade_block(keys[6], 8 * ngf, 4 * ngf),
        "up2": init_spade_block(keys[7], 4 * ngf, 2 * ngf),
        "up3": init_spade_block(keys[8], 2 * ngf, ngf, use_rgb=False),
        "conv_img": init_conv(keys[9], 3, ngf, 3),
        "mean_codes": jnp.zeros((N_REGIONS, STYLE_LEN), jnp.float32),
    }


def _pack_ace(p):
    """Pack one ACE's param pairs (exact, idempotent): fc_mu list ->
    stacked [19,512,512], and the gamma/beta conv pairs (same input each)
    -> one conv with concatenated output channels.

    MEASURED SLIGHTLY SLOWER on v5e (sean_decode B=2: 4.1 -> 4.4 ms/call)
    — XLA already hoists/fuses the per-call stacks well. Opt-in via
    zoo.pack_zoo; not the api/bench default."""
    if "fc_mu_w" in p or ("fc_mu" not in p and "gb" in p.get("spade", {})):
        return p
    q = dict(p)
    sp = p["spade"]
    if "gamma" in sp:
        q["spade"] = {
            "shared": sp["shared"],
            "gb": {"w": jnp.concatenate([sp["gamma"]["w"], sp["beta"]["w"]], -1),
                   "b": jnp.concatenate([sp["gamma"]["b"], sp["beta"]["b"]], -1)},
        }
    if "fc_mu" in p:
        q["fc_mu_w"] = jnp.stack([f["w"] for f in p["fc_mu"]])
        q["fc_mu_b"] = jnp.stack([f["b"] for f in p["fc_mu"]])
        del q["fc_mu"]
        cg, cb = p["conv_gamma"], p["conv_beta"]
        q["conv_gb"] = {"w": jnp.concatenate([cg["w"], cb["w"]], -1),
                        "b": jnp.concatenate([cg["b"], cb["b"]], -1)}
        del q["conv_gamma"], q["conv_beta"]
    return q


def pack_sean(p):
    """Pre-pack every ACE in the SEAN generator tree (exact, idempotent)."""
    q = dict(p)
    for name in ("head0", "mid0", "mid1", "up0", "up1", "up2", "up3"):
        blk = dict(q[name])
        for an in ("ace0", "ace1", "ace_s"):
            if an in blk:
                blk[an] = _pack_ace(blk[an])
        q[name] = blk
    return q


def _up2(x: Array) -> Array:
    return resize(x, (x.shape[1] * 2, x.shape[2] * 2), "nearest")


@jax.named_scope("sean_encode")
def sean_encode(p, img: Array, labels: Array) -> Array:
    """encode_sean (pix2pix_model.py:299-306): [B,19,512] region codes."""
    onehot = one_hot_mask(labels, N_REGIONS, img.dtype)
    return zencoder_codes(p["zencoder"], img, onehot)


@jax.named_scope("sean_decode")
def sean_decode(p, style_codes: Array, target_labels: Array,
                noise_key: Optional[Array] = None) -> Array:
    """decode_sean (pix2pix_model.py:309-325): render codes under a new mask.

    Regions whose code rows are exactly zero fall back to the stored
    mean_codes (the reference's median ACE npy table).
    """
    empty = jnp.all(style_codes == 0, axis=-1, keepdims=True)  # [B,19,1]
    codes = jnp.where(empty, p["mean_codes"][None].astype(style_codes.dtype),
                      style_codes)

    seg = one_hot_mask(target_labels, N_REGIONS, codes.dtype)
    x = resize(seg, (8, 8), "nearest")
    x = conv2d_p(p["fc"], x, padding=1)

    blocks = ("head0", "mid0", "mid1", "up0", "up1", "up2", "up3")
    ups_before = {"mid0", "up0", "up1", "up2", "up3"}  # 'normal': 5 upsamples
    keys = (jax.random.split(noise_key, len(blocks))
            if noise_key is not None else [None] * len(blocks))
    for name, k in zip(blocks, keys):
        if name in ups_before:
            x = _up2(x)
        x = spade_block(p[name], x, seg, style_codes=codes, keys=k)

    return tanh(conv2d_p(p["conv_img"], leaky_relu(x, 0.2), padding=1))
