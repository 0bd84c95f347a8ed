"""Style-modulated convolution, TPU-first formulation.

Reference: ModulatedConv2d (models/stylegan2/model.py:183-279). The CUDA
implementation bakes the per-sample style into the *weights* and runs a
grouped conv with batch→groups — a layout that is hostile to the TPU MXU
(tiny per-group contractions, per-sample weight materialization in HBM).

We use the mathematically identical activation-scaling form:

    conv(x, scale·W·s[b])  ==  conv(x ⊙ s[b], scale·W)          (linearity)
    demod[b,o] = rsqrt( Σ_{i,kh,kw} (scale·W[o,i]·s[b,i])² + ε )

so the hot op is ONE shared-weight convolution (dense MXU work, weights
stay resident) plus two cheap per-sample channel scalings fused into its
prologue/epilogue by XLA. The demod coefficient contracts W² over its
spatial taps once ([O,I] matrix) and hits the MXU as a [B,I]x[I,O] matmul.

Upsampling keeps the reference's transposed-conv-then-blur semantics via an
lhs-dilated conv on the pre-flipped kernel (params/convert.py flips once at
load). Downsampling blurs then strides. All paths NHWC.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.ops.basic import conv2d
from hairfastgan_tpu.ops.equalized import equal_linear
from hairfastgan_tpu.ops.upfirdn2d import blur2d

Array = jax.Array


def _fuse_blur_kernel(w: Array, blur_kernel, gain: float, dtype) -> Array:
    """Compose an HWIO conv kernel with the separable FIR blur.

    Correlation chain identity: corr(corr(x, W), B') == corr(x, K) with
    K[t] = sum_a W[a] B'[t-a]; B' is the flipped (true-conv) blur — for the
    symmetric [1,3,3,1] family flip(B) == B. Built as pk^2 shifted adds of
    the kh x kw kernel into a (kh+pk-1)^2 kernel at trace time.
    """
    from hairfastgan_tpu.ops.upfirdn2d import make_fir_kernel

    taps = np.flip(make_fir_kernel(tuple(int(v) for v in blur_kernel), gain))
    pk = len(taps)
    kh, kw, cin, cout = w.shape
    k = jnp.zeros((kh + pk - 1, kw + pk - 1, cin, cout), dtype)
    wd = w.astype(dtype)
    for bu in range(pk):
        for bv in range(pk):
            k = k.at[bu:bu + kh, bv:bv + kw].add(wd * float(taps[bu] * taps[bv]))
    return k


def _style_scale(p, style: Array, x_dtype) -> Array:
    """modulation EqualLinear(style_dim -> in_ch, bias_init=1) -> [B, in_ch]."""
    return equal_linear(p["modulation"], style).astype(x_dtype)


def _demod_coeff(w: Array, s: Array, fan_scale: float, eps: float = 1e-8) -> Array:
    """demod[b,o] = rsqrt(sum_{hw,i} (fan_scale*w[h,w,i,o]*s[b,i])^2 + eps)."""
    w2 = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(0, 1))  # [I, O]
    q = jnp.dot(jnp.square(s.astype(jnp.float32)), w2,
                preferred_element_type=jnp.float32)  # [B, O]
    return jax.lax.rsqrt(q * (fan_scale * fan_scale) + eps)


def modulated_conv2d(
    p,
    x: Array,
    style: Array,
    *,
    demodulate: bool = True,
    up: bool = False,
    down: bool = False,
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1),
    fuse_blur: bool = False,
) -> Array:
    """NHWC modulated conv matching ModulatedConv2d.forward (model.py:238-279).

    Params:
      p['w']        : HWIO kernel. For `up=True` this is the transposed-conv
                      kernel already converted to forward form (spatially
                      flipped, I=in O=out) by the checkpoint converter.
      p['modulation']: EqualLinear params (style_dim -> in_ch, bias init 1).
    """
    kh, kw, cin, cout = p["w"].shape
    fan_scale = 1.0 / math.sqrt(cin * kh * kw)
    s = _style_scale(p, style, x.dtype)  # [B, I]

    xm = x * s[:, None, None, :]
    w = p["w"].astype(x.dtype) * jnp.asarray(fan_scale, x.dtype)

    if up:
        factor = 2
        if fuse_blur:
            # Single fused (k+pk-1)^2 lhs-dilated conv (blur composed into
            # the kernel; see _fuse_blur_kernel). Exact, but MEASURED SLOWER
            # on v5e (full render 41 -> 59 ms: the 4x MAC increase beats the
            # saved blur HBM passes — these convs are MXU-bound). Kept as an
            # opt-in for future hardware; default is the two-pass path.
            pk = len(blur_kernel)
            pp = (pk - factor) - (kh - 1)
            pad = ((pp + 1) // 2 + factor - 1, pp // 2 + 1)
            k_fused = _fuse_blur_kernel(w, blur_kernel, float(factor ** 2),
                                        x.dtype)
            y = conv2d(
                xm, k_fused, stride=1,
                padding=[(pad[0] + kh - 1, pad[1] + kh - 1),
                         (pad[0] + kw - 1, pad[1] + kw - 1)],
                lhs_dilation=factor,
            )
            if demodulate:
                d = _demod_coeff(p["w"], s, fan_scale).astype(x.dtype)
                y = y * d[:, None, None, :]
            return y
        # conv_transpose2d(stride=2, padding=0) == lhs-dilated conv with
        # padding (k-1) on both sides of each axis (kernel pre-flipped).
        y = conv2d(
            xm, w, stride=1,
            padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
            lhs_dilation=factor,
        )
        if demodulate:
            d = _demod_coeff(p["w"], s, fan_scale).astype(x.dtype)
            y = y * d[:, None, None, :]
        # Blur pad from reference (model.py:204-210), kernel gain factor**2
        pk = len(blur_kernel)
        pp = (pk - factor) - (kh - 1)
        pad = ((pp + 1) // 2 + factor - 1, pp // 2 + 1)
        y = blur2d(y, blur_kernel, pad=pad, gain=float(factor ** 2))
        return y

    if down:
        factor = 2
        pk = len(blur_kernel)
        pp = (pk - factor) + (kh - 1)
        pad = ((pp + 1) // 2, pp // 2)
        xm = blur2d(xm, blur_kernel, pad=pad)
        y = conv2d(xm, w, stride=factor, padding=0)
        if demodulate:
            d = _demod_coeff(p["w"], s, fan_scale).astype(x.dtype)
            y = y * d[:, None, None, :]
        return y

    y = conv2d(xm, w, stride=1, padding=kh // 2)
    if demodulate:
        d = _demod_coeff(p["w"], s, fan_scale).astype(x.dtype)
        y = y * d[:, None, None, :]
    return y
