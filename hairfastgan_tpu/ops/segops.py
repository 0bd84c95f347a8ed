"""Segmentation-region ops: one-hot, per-region pooling and broadcast.

These replace the per-(batch, region) python loops in the reference SEAN code
(Zencoder architecture.py:186-207, ACE normalization.py:124-170) with one-hot
einsums — dense MXU contractions with no host control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def one_hot_mask(labels: Array, num_classes: int, dtype=jnp.float32) -> Array:
    """[B,H,W] int labels -> [B,H,W,K] one-hot (torch scatter semantics).

    Labels outside [0, num_classes) produce all-zero rows (the reference maps
    255 -> dropped channel, shape_util.py:6-14).
    """
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def region_mean(feat: Array, onehot: Array) -> Array:
    """Per-region masked average pool.

    feat [B,H,W,C], onehot [B,H,W,K] -> [B,K,C] where empty regions give 0
    (matches Zencoder's zero-init codes_vector, architecture.py:196-207).
    """
    s = jnp.einsum("bhwc,bhwk->bkc", feat, onehot.astype(feat.dtype),
                   preferred_element_type=jnp.float32)
    cnt = jnp.einsum("bhwk->bk", onehot.astype(jnp.float32))
    denom = jnp.where(cnt > 0, cnt, 1.0)
    out = s / denom[..., None]
    return jnp.where((cnt > 0)[..., None], out, 0.0).astype(feat.dtype)


def region_broadcast(codes: Array, onehot: Array) -> Array:
    """Scatter per-region vectors back over the map.

    codes [B,K,C], onehot [B,H,W,K] -> [B,H,W,C]; pixels with no region
    (all-zero one-hot row) get 0 — identical to the masked_scatter_ into a
    zero tensor in ACE (normalization.py:119-154).
    """
    return jnp.einsum("bkc,bhwk->bhwc", codes, onehot.astype(codes.dtype),
                      preferred_element_type=codes.dtype)
