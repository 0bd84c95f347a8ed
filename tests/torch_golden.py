"""Independent torch re-implementations used as numerical goldens.

These are written from the public algorithm definitions (upfirdn = zero-stuff
+ FIR + stride; Keys bicubic; equalized LR layers), NOT copied from the
reference — they exist so every JAX op has a second, independently-derived
implementation to compare against.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def upfirdn2d_torch(x_nchw: torch.Tensor, k2d: torch.Tensor, up: int, down: int, pad):
    """Zero-stuff -> pad -> 2D FIR (true convolution) -> stride."""
    b, c, h, w = x_nchw.shape
    x = x_nchw.reshape(b * c, 1, h, w)
    if up > 1:
        z = torch.zeros(b * c, 1, h, up, w, up)
        z[:, :, :, 0, :, 0] = x
        x = z.reshape(b * c, 1, h * up, w * up)
    p0, p1 = pad
    x = F.pad(x, (p0, p1, p0, p1))
    kh, kw = k2d.shape
    w_ = torch.flip(k2d, [0, 1]).reshape(1, 1, kh, kw)
    x = F.conv2d(x, w_)
    x = x[:, :, ::down, ::down]
    return x.reshape(b, c, x.shape[2], x.shape[3])


def make_kernel_torch(k1d, gain: float = 1.0) -> torch.Tensor:
    k = torch.tensor(k1d, dtype=torch.float32)
    k2 = torch.outer(k, k)
    k2 = k2 / k2.sum()
    return k2 * gain


def fused_leaky_relu_torch(x, bias, slope=0.2, scale=math.sqrt(2)):
    shape = [1, -1] + [1] * (x.ndim - 2)
    return F.leaky_relu(x + bias.reshape(shape), slope) * scale


def equal_linear_torch(x, w, b, lr_mul=1.0, activation=None):
    scale = (1.0 / math.sqrt(w.shape[1])) * lr_mul
    if activation == "fused_lrelu":
        y = F.linear(x, w * scale)
        return fused_leaky_relu_torch(y, b * lr_mul)
    return F.linear(x, w * scale, b * lr_mul if b is not None else None)


def modulated_conv2d_torch(x, weight_oikk, style_vec, demodulate=True,
                           up=False, down=False, blur_k=(1, 3, 3, 1)):
    """Per-sample-weight formulation (grouped conv) of modulated conv.

    `style_vec` is the already-projected per-sample in-channel scale [B, I]
    (the EqualLinear modulation output), so this tests the conv math in
    isolation from the style projection.
    """
    b, cin, h, w_sp = x.shape
    cout, _, k, _ = weight_oikk.shape
    scale = 1.0 / math.sqrt(cin * k * k)
    w = scale * weight_oikk.unsqueeze(0) * style_vec.reshape(b, 1, cin, 1, 1)
    if demodulate:
        demod = torch.rsqrt(w.pow(2).sum([2, 3, 4]) + 1e-8)
        w = w * demod.reshape(b, cout, 1, 1, 1)
    if up:
        x = x.reshape(1, b * cin, h, w_sp)
        w = w.transpose(1, 2).reshape(b * cin, cout, k, k)
        out = F.conv_transpose2d(x, w, padding=0, stride=2, groups=b)
        out = out.reshape(b, cout, out.shape[2], out.shape[3])
        p = (len(blur_k) - 2) - (k - 1)
        pad = ((p + 1) // 2 + 1, p // 2 + 1)
        return upfirdn2d_torch(out, make_kernel_torch(blur_k, gain=4.0), 1, 1, pad)
    if down:
        p = (len(blur_k) - 2) + (k - 1)
        pad = ((p + 1) // 2, p // 2)
        x = upfirdn2d_torch(x, make_kernel_torch(blur_k), 1, 1, pad)
        x = x.reshape(1, b * cin, x.shape[2], x.shape[3])
        w = w.reshape(b * cout, cin, k, k)
        out = F.conv2d(x, w, padding=0, stride=2, groups=b)
        return out.reshape(b, cout, out.shape[2], out.shape[3])
    x = x.reshape(1, b * cin, h, w_sp)
    w = w.reshape(b * cout, cin, k, k)
    out = F.conv2d(x, w, padding=k // 2, groups=b)
    return out.reshape(b, cout, out.shape[2], out.shape[3])


def bicubic_kernel_np(x, a=-0.5):
    ax = abs(x)
    if ax <= 1:
        return (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1
    if ax < 2:
        return a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a
    return 0.0


def pulse_bicubic_downsample_torch(x_nchw: torch.Tensor, factor: int) -> torch.Tensor:
    size = factor * 4
    k = torch.tensor([bicubic_kernel_np((i - size // 2 + 0.5) / factor)
                      for i in range(size)], dtype=torch.float32)
    k = k / k.sum()
    c = x_nchw.shape[1]
    k1 = k.reshape(1, 1, size, 1).repeat(c, 1, 1, 1)
    k2 = k.reshape(1, 1, 1, size).repeat(c, 1, 1, 1)
    pad = size - factor
    pt, pb = pad // 2, pad - pad // 2
    x = F.pad(x_nchw, (0, 0, pt, pb), "reflect")
    x = F.conv2d(x, k1, stride=(factor, 1), groups=c)
    x = F.pad(x, (pt, pb, 0, 0), "reflect")
    x = F.conv2d(x, k2, stride=(1, factor), groups=c)
    return x


def dilate_erode_torch(mask_nchw: torch.Tensor, iters: int):
    wt = torch.tensor([[0., 1., 0.], [1., 1., 1.], [0., 1., 0.]]).reshape(1, 1, 3, 3)
    n = mask_nchw.shape[0]
    m = mask_nchw.clone().float().repeat(2, 1, 1, 1)
    for _ in range(iters):
        m = F.conv2d(m, wt, padding="same")
        m[:n] = (m[:n] > 0).float()
        m[n:] = (m[n:] == 5).float()
    return m[:n], m[n:]
