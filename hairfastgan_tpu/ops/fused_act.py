"""fused bias + leaky ReLU + gain.

Reference: models/stylegan2/op/fused_act.py:73-96 (CUDA kernel
fused_bias_act_kernel.cu). y = scale * leaky_relu(x + b, slope). On TPU this
is a pure VPU elementwise chain that XLA fuses into the producing matmul/conv
epilogue automatically — writing it as plain jnp is already "speed of light";
a Pallas kernel would only re-derive the same fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

SQRT2 = 1.4142135623730951


def fused_leaky_relu(
    x: Array,
    bias: Array | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
) -> Array:
    """y = scale * lrelu(x + bias); bias broadcasts over the channel axis.

    Channel axis is the LAST axis (NHWC / [..., C]), unlike the torch
    reference which is NCHW (fused_act.py:86-93).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    y = jnp.where(x >= 0, x, x * negative_slope)
    return y * jnp.asarray(scale, x.dtype)
