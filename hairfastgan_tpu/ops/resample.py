"""Resize/resampling as precomputed separable matrices.

Every resize the pipeline needs (torch `F.interpolate` nearest / bilinear /
bicubic with either align_corners convention, and the PULSE-style bicubic FIR
downsampler of the reference `utils/bicubic.py:6-75`) is a fixed *linear* map
per spatial axis at static shapes. We precompute the [out, in] matrix once at
trace time with numpy and apply it as two einsums — on TPU these land on the
MXU and fuse with neighbors, which beats gather-based resampling by a wide
margin and is bit-exact to the torch reference (golden tests in
tests/test_resample.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _cubic_weight(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic kernel with parameter a (torch bicubic uses a=-0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0,
        np.where(ax < 2.0, a * ax ** 3 - 5.0 * a * ax ** 2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def resize_matrix(
    in_size: int, out_size: int, mode: str, align_corners: bool = False
) -> np.ndarray:
    """[out, in] matrix reproducing torch F.interpolate on one axis.

    Modes: 'nearest' (torch legacy floor indexing), 'bilinear', 'bicubic'.
    Edge handling matches torch: source coordinates are clamped to the valid
    range (border replication).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "nearest":
        # torch 'nearest': src = floor(dst * in/out)
        scale = in_size / out_size
        for i in range(out_size):
            j = min(int(np.floor(i * scale)), in_size - 1)
            m[i, j] = 1.0
        return m.astype(np.float32)

    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        src = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5

    if mode == "bilinear":
        # torch clamps src to >= 0 before splitting into floor+frac
        s = np.clip(src, 0.0, None)
        j0 = np.floor(s).astype(np.int64)
        frac = s - j0
        j0 = np.clip(j0, 0, in_size - 1)
        j1 = np.clip(j0 + 1, 0, in_size - 1)
        for i in range(out_size):
            m[i, j0[i]] += 1.0 - frac[i]
            m[i, j1[i]] += frac[i]
        return m.astype(np.float32)

    if mode == "bicubic":
        a = -0.75
        j0 = np.floor(src).astype(np.int64)
        t = src - j0
        for i in range(out_size):
            # taps at j0-1 .. j0+2 with clamped indices (border replicate)
            for k in range(-1, 3):
                w = _cubic_weight(np.array(t[i] - k), a)
                j = int(np.clip(j0[i] + k, 0, in_size - 1))
                m[i, j] += float(w)
        return m.astype(np.float32)

    raise ValueError(f"unknown resize mode {mode!r}")


def _apply_axis_matrices(x: Array, ah: np.ndarray, aw: np.ndarray) -> Array:
    ahj = jnp.asarray(ah, x.dtype)
    awj = jnp.asarray(aw, x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ahj, x, preferred_element_type=x.dtype)
    return jnp.einsum("pw,bhwc->bhpc", awj, y, preferred_element_type=x.dtype)


def resize(
    x: Array,
    out_hw: Tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> Array:
    """torch-F.interpolate-equivalent resize of an NHWC tensor."""
    oh, ow = out_hw
    if (oh, ow) == (x.shape[1], x.shape[2]):
        return x
    ah = resize_matrix(x.shape[1], oh, mode, align_corners)
    aw = resize_matrix(x.shape[2], ow, mode, align_corners)
    return _apply_axis_matrices(x, ah, aw)


@functools.lru_cache(maxsize=None)
def bicubic_downsample_matrix(in_size: int, factor: int) -> np.ndarray:
    """PULSE BicubicDownSample as an [in/factor, in] matrix.

    Reproduces reference utils/bicubic.py:6-75: a 4*factor-tap bicubic FIR
    (a=-0.5), normalized, applied with stride=factor after reflect padding of
    (4*factor - factor) split floor/ceil.
    """
    size = factor * 4
    a = -0.5
    xs = (np.arange(size) - np.floor(size / 2) + 0.5) / factor
    k = _cubic_weight(xs, a)
    k = k / k.sum()

    pad_total = size - factor
    pad_lo = pad_total // 2
    pad_hi = pad_total - pad_lo
    out_size = in_size // factor

    # index map for torch 'reflect' padding (no edge repeat)
    idx = np.arange(-pad_lo, in_size + pad_hi)
    idx = np.abs(idx)  # reflect at 0
    idx = np.where(idx >= in_size, 2 * (in_size - 1) - idx, idx)

    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        for t in range(size):
            m[o, idx[o * factor + t]] += k[t]
    return m.astype(np.float32)


def bicubic_downsample(x: Array, factor: int) -> Array:
    """Deterministic 1024->1024/factor PULSE downsample on NHWC images."""
    ah = bicubic_downsample_matrix(x.shape[1], factor)
    aw = bicubic_downsample_matrix(x.shape[2], factor)
    return _apply_axis_matrices(x, ah, aw)
