"""upfirdn2d — pad → zero-stuff upsample → FIR → downsample, fused.

TPU-native equivalent of the reference CUDA kernel
(models/stylegan2/op/upfirdn2d_kernel.cu, semantics documented by the pure
fallback models/stylegan2/op/upfirdn2d.py:159-200). On TPU the whole
operation is a single `lax.conv_general_dilated` with `lhs_dilation=up`,
`window_strides=down` and explicit padding, which Mosaic/XLA maps onto the
convolution unit in one pass — no intermediate zero-stuffed tensor is ever
materialized. The FIR kernels here are separable ([1,3,3,1] outer products),
so we run two rank-1 depthwise passes, halving FLOPs and HBM traffic vs the
reference's dense 4x4 filter.

The VJP of upfirdn2d(up, down, pad) is upfirdn2d(down, up, g_pad) with the
flipped kernel — same identity the reference uses (op/upfirdn2d.py:31-43) —
which `lax.conv_general_dilated`'s autodiff already produces, so no custom
VJP is required.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def make_fir_kernel(k: Tuple[int, ...], gain: float = 1.0) -> np.ndarray:
    """Normalized 1-D FIR tap vector (reference make_kernel, model.py:24-32).

    Returns the 1-D taps; separable 2-D application uses the outer product
    implicitly. `gain` folds the (factor**2) upsample gain in.
    """
    arr = np.asarray(k, dtype=np.float32)
    arr = arr / arr.sum()
    return arr * np.sqrt(gain)  # sqrt: applied once per separable axis


def _depthwise_fir_1d(
    x: Array,
    taps: np.ndarray,
    axis: int,
    up: int,
    down: int,
    pad: Tuple[int, int],
) -> Array:
    """1-D up-FIR-down along H (axis=1) or W (axis=2) of NHWC, depthwise."""
    c = x.shape[3]
    kt = np.flip(taps).copy()  # conv (true convolution) vs correlation
    # lax lhs_dilation produces (n-1)*up+1 samples; the reference zero-stuff
    # produces n*up (trailing zeros kept) — add them back as trailing pad.
    pad = (pad[0], pad[1] + up - 1)
    if axis == 1:
        w = jnp.asarray(kt.reshape(-1, 1, 1, 1), x.dtype)
        w = jnp.tile(w, (1, 1, 1, c))
        strides = (down, 1)
        lhs_dil = (up, 1)
        padding = [pad, (0, 0)]
    else:
        w = jnp.asarray(kt.reshape(1, -1, 1, 1), x.dtype)
        w = jnp.tile(w, (1, 1, 1, c))
        strides = (1, down)
        lhs_dil = (1, up)
        padding = [(0, 0), pad]
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype,
    )


def _shift_add_fir_1d(
    x: Array,
    taps: np.ndarray,
    axis: int,
    up: int,
    down: int,
    pad: Tuple[int, int],
) -> Array:
    """Same contract as `_depthwise_fir_1d`, as shifted weighted adds.

    Depthwise convs on TPU go through XLA's space-to-batch conversion, which
    surrounds every blur with layout copies (profiled ~1/6 of the whole swap
    program in copies + conv overhead). A T-tap FIR is just T shifted
    multiply-adds, which XLA fuses into ONE elementwise loop over a single
    padded buffer — no conv machinery at all. Upsampling uses the polyphase
    split: output phase φ only reads taps t with (t+φ-p0) ≡ 0 (mod up), so
    each phase is its own small shift-add and phases interleave by a
    stack+reshape on the spatial axis.
    """
    n = x.shape[axis]
    t_len = len(taps)
    kt = np.flip(taps).copy()  # true convolution vs correlation
    m_out = (n * up + pad[0] + pad[1] - t_len) // down + 1

    def ax_pad(arr, lo, hi):
        cfg = [(0, 0)] * 4
        cfg[axis] = (lo, hi)
        return jnp.pad(arr, cfg)

    def ax_slice(arr, start, length, stride=1):
        idx = [slice(None)] * 4
        idx[axis] = slice(start, start + (length - 1) * stride + 1, stride)
        return arr[tuple(idx)]

    if up == 1:
        # y[i] = sum_t kt[t] * xpad[i*down + t]
        xp = ax_pad(x, pad[0], max(0, (m_out - 1) * down + t_len - n - pad[0]))
        y = None
        for t in range(t_len):
            term = ax_slice(xp, t, m_out, down) * jnp.asarray(kt[t], x.dtype)
            y = term if y is None else y + term
        return y

    # up > 1, down == 1 (the generator's upsample path): polyphase
    phases = []
    # phase φ: y[up*i+φ] = sum over taps t with (φ + t - pad[0]) % up == 0
    #          of kt[t] * x[i + (φ + t - pad[0]) // up]
    n_ph = -(-m_out // up)  # per-phase length (compute full, crop after)
    offs_all = [(phi, t, (phi + t - pad[0]) // up)
                for phi in range(up) for t in range(t_len)
                if (phi + t - pad[0]) % up == 0]
    lo = max(0, -min(o for _, _, o in offs_all))
    hi = max(0, max(o for _, _, o in offs_all) + n_ph - n)
    xp = ax_pad(x, lo, hi)
    for phi in range(up):
        y = None
        for _, t, o in [v for v in offs_all if v[0] == phi]:
            term = ax_slice(xp, o + lo, n_ph) * jnp.asarray(kt[t], x.dtype)
            y = term if y is None else y + term
        if y is None:
            y = jnp.zeros_like(ax_slice(xp, 0, n_ph))
        phases.append(y)
    y = jnp.stack(phases, axis=axis + 1)  # [..., n_ph, up, ...]
    shape = list(y.shape)
    shape[axis:axis + 2] = [n_ph * up]
    y = y.reshape(shape)
    return ax_slice(y, 0, m_out)


def upfirdn2d(
    x: Array,
    kernel_1d: Sequence[int] | np.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
    gain: float = 1.0,
) -> Array:
    """Separable upfirdn2d on NHWC with identical pad on both axes.

    Matches reference `upfirdn2d(input, kernel, up, down, pad)` where kernel
    is the outer product of `kernel_1d` normalized to sum 1 and multiplied by
    `gain` (the reference folds `factor**2` into the kernel for upsampling —
    see model.py:40, 84).
    """
    taps = make_fir_kernel(tuple(int(v) for v in np.asarray(kernel_1d).tolist()), gain)
    fir = _shift_add_fir_1d if (pad[0] >= 0 and pad[1] >= 0
                                and (up == 1 or down == 1)) else _depthwise_fir_1d
    y = fir(x, taps, axis=1, up=up, down=down, pad=pad)
    y = fir(y, taps, axis=2, up=up, down=down, pad=pad)
    return y


def blur2d(x: Array, kernel_1d, pad: Tuple[int, int], gain: float = 1.0) -> Array:
    """FIR blur (reference Blur, model.py:77-93)."""
    return upfirdn2d(x, kernel_1d, up=1, down=1, pad=pad, gain=gain)


def upsample2d(x: Array, kernel_1d=(1, 3, 3, 1), factor: int = 2) -> Array:
    """Reference Upsample (model.py:35-53): kernel gain factor**2."""
    k = len(kernel_1d)
    p = k - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2)
    return upfirdn2d(x, kernel_1d, up=factor, down=1, pad=pad, gain=float(factor ** 2))


def downsample2d(x: Array, kernel_1d=(1, 3, 3, 1), factor: int = 2) -> Array:
    """Reference Downsample (model.py:56-74)."""
    k = len(kernel_1d)
    p = k - factor
    pad = ((p + 1) // 2, p // 2)
    return upfirdn2d(x, kernel_1d, up=1, down=factor, pad=pad)
