"""Binary morphology (dilate/erode with a 3x3 cross), NHWC.

Reference: utils/image_utils.py:27-55 runs N iterations of a float conv with
the cross kernel and thresholds (>0 for dilate, ==5 for erode) on a doubled
batch. For binary masks that is exactly N-fold morphological dilate/erode
with the cross structuring element. On TPU we use shift+max/min (VPU ops, no
conv needed); both outputs come from one fused scan.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _cross_max(x: Array) -> Array:
    up = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dn = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    lf = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    rt = jnp.pad(x[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    return jnp.maximum(jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt)), x)


def _cross_min(x: Array) -> Array:
    up = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)), constant_values=0)
    dn = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)), constant_values=0)
    lf = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)), constant_values=0)
    rt = jnp.pad(x[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)), constant_values=0)
    return jnp.minimum(jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt)), x)


def dilate_erode(mask: Array, iterations: int = 5) -> Tuple[Array, Array]:
    """(dilated, eroded) of a binary NHWC mask after `iterations` rounds.

    Matches DilateErosion.mask (utils/image_utils.py:42-55) for binary input:
    the reference's zero padding makes borders count as background for the
    erosion (conv sum < 5 at edges), reproduced here by the 0 pad in
    `_cross_min`.
    """
    b = (mask > 0).astype(mask.dtype)

    def body(carry, _):
        d, e = carry
        return (_cross_max(d), _cross_min(e)), None

    (d, e), _ = jax.lax.scan(body, (b, b), None, length=iterations)
    return d, e
