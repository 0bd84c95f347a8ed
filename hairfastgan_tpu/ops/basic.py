"""Primitive NN ops, NHWC, pure functions over param dicts.

Conventions:
  * images/features are NHWC
  * conv weights are HWIO (torch OIHW converts via transpose(2, 3, 1, 0))
  * linear weights are [in, out] (torch [out, in] converts via .T)
  * params are plain dicts of jnp arrays

All inference-time normalizations (BatchNorm with running stats, LayerNorm,
InstanceNorm) are implemented directly; there is no training/eval mode flag —
training code passes batch statistics explicitly where needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def linear(p, x: Array) -> Array:
    """y = x @ w + b with w:[in,out]."""
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def conv2d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[str, int, Tuple[int, int], Sequence[Tuple[int, int]]] = 0,
    groups: int = 1,
    lhs_dilation: Union[int, Tuple[int, int]] = 1,
    rhs_dilation: Union[int, Tuple[int, int]] = 1,
) -> Array:
    """NHWC conv with HWIO weights (cross-correlation, torch semantics)."""
    if isinstance(padding, str):
        pad = padding
    elif isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = list(padding)
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=_pair(stride),
        padding=pad,
        lhs_dilation=_pair(lhs_dilation),
        rhs_dilation=_pair(rhs_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv2d_p(p, x: Array, **kw) -> Array:
    """conv2d reading weights from a param dict {'w': HWIO, 'b': optional}."""
    return conv2d(x, p["w"], p.get("b"), **kw)


def conv_transpose2d(
    x: Array,
    w_hwoi_flipped: Array,
    *,
    stride: int = 2,
    padding: int = 0,
) -> Array:
    """torch conv_transpose2d(stride=s, padding=p) equivalent.

    Expects the weight ALREADY converted to forward-conv form: torch stores
    transposed-conv weights as [in, out, kh, kw]; the equivalent forward conv
    uses the spatially-flipped kernel with in/out swapped, i.e. HWIO with
    I=in, O=out and both spatial axes reversed. `params/convert.py` does that
    once at load time so the hot path is a single lhs-dilated conv.
    """
    kh, kw = w_hwoi_flipped.shape[0], w_hwoi_flipped.shape[1]
    pad_h = (kh - 1 - padding, kh - 1 - padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding)
    return conv2d(
        x,
        w_hwoi_flipped,
        stride=1,
        padding=[pad_h, pad_w],
        lhs_dilation=stride,
    )


def batch_norm(p, x: Array, eps: float = 1e-5) -> Array:
    """Inference BatchNorm over the channel (last) axis using running stats.

    The per-channel scale/bias are folded in f32 (rsqrt precision), but the
    map-sized affine runs in x.dtype: materializing an f32 copy of every
    BN'd feature map doubled HBM traffic AND forced bf16<->f32 re-tiling
    copies around each norm (profiled at ~6 ms/swap before this change).
    """
    dt = x.dtype
    scale = p["gamma"].astype(jnp.float32) * jax.lax.rsqrt(
        p["var"].astype(jnp.float32) + eps
    )
    bias = p["beta"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return x * scale.astype(dt) + bias.astype(dt)


def _norm_apply(x: Array, mean: Array, var: Array, gamma, beta,
                eps: float) -> Array:
    """y = (x - mean) * rsqrt(var+eps) [* gamma] [+ beta].

    Statistics arrive in f32; the folded scale/shift are tiny (one value per
    reduced group) and stay f32, but the map-sized multiply-add runs in
    x.dtype — an f32 copy of every normalized map would double HBM traffic
    and insert bf16<->f32 re-tiling copies (profiled ~4.5 ms/swap).
    """
    scale = jax.lax.rsqrt(var + eps)
    if gamma is not None:
        scale = scale * gamma.astype(jnp.float32)
    shift = -mean * scale
    if beta is not None:
        shift = shift + beta.astype(jnp.float32)
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def layer_norm(x: Array, axes, gamma=None, beta=None, eps: float = 1e-5) -> Array:
    """LayerNorm over the trailing `axes` (ints or tuple), optional affine."""
    if isinstance(axes, int):
        axes = (axes,)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return _norm_apply(x, mean, var, gamma, beta, eps)


def instance_norm(x: Array, gamma=None, beta=None, eps: float = 1e-5) -> Array:
    """InstanceNorm2d over spatial dims of NHWC (affine optional)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return _norm_apply(x, mean, var, gamma, beta, eps)


def leaky_relu(x: Array, negative_slope: float = 0.2) -> Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def prelu(p, x: Array) -> Array:
    """PReLU with per-channel weight on the last axis."""
    a = p["w"].astype(x.dtype)
    return jnp.where(x >= 0, x, x * a)


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def tanh(x: Array) -> Array:
    return jnp.tanh(x)


def max_pool(x: Array, window: int, stride: int, padding: int = 0) -> Array:
    """NHWC max pool, torch MaxPool2d semantics (pad with -inf)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def avg_pool_global(x: Array) -> Array:
    """Global average pool NHWC -> [N,1,1,C]."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Exact torch AdaptiveAvgPool2d bin map as an [out, in] averaging matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x: Array, out_hw: Tuple[int, int]) -> Array:
    """torch AdaptiveAvgPool2d on NHWC via two exact pooling matmuls (MXU)."""
    oh, ow = out_hw
    ah = jnp.asarray(_adaptive_pool_matrix(x.shape[1], oh), x.dtype)
    aw = jnp.asarray(_adaptive_pool_matrix(x.shape[2], ow), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ah, x, preferred_element_type=x.dtype)
    return jnp.einsum("pw,bhwc->bhpc", aw, y, preferred_element_type=x.dtype)
