"""On-device Poisson image blending.

Replaces the reference's optional `poisson_image_blending` final composite
(utils/image_utils.py:58-94), which shells out to the external `fpie` CLI
(a separate process, PNG round-trip). Here seamless cloning is solved
directly on the TPU: Jacobi iterations of the discrete Poisson equation

    lap(out) = lap(src)   inside the mask,   out = dst   outside

expressed as a `lax.scan` of 4-neighbor averages — pure VPU work at 1024^2,
converging in a few hundred iterations (the reference's fpie default is
comparable grid iterations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _lap(x: Array) -> Array:
    """4-neighbor Laplacian with edge replication, NHWC."""
    up = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    dn = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    lf = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    rt = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    return 4.0 * x - up - dn - lf - rt


def _neighbor_sum(x: Array) -> Array:
    up = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    dn = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    lf = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    rt = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    return up + dn + lf + rt


def poisson_blend(src: Array, dst: Array, mask: Array,
                  n_iters: int = 300) -> Array:
    """Seamless-clone `src` into `dst` inside `mask` ([B,H,W,1] binary).

    All inputs [0,1] NHWC. Gradient field comes from `src`; boundary values
    from `dst`. Returns the blended image clipped to [0,1].
    """
    m = (mask > 0.5).astype(src.dtype)
    target_lap = _lap(src)
    init = dst * (1 - m) + src * m

    def body(x, _):
        x_new = (_neighbor_sum(x) + target_lap) / 4.0
        x = m * x_new + (1 - m) * dst
        return x, None

    out, _ = jax.lax.scan(body, init, None, length=n_iters)
    return jnp.clip(out, 0.0, 1.0)


def poisson_blend_multigrid(src: Array, dst: Array, mask: Array,
                            n_iters: int = 150,
                            levels: int = 4) -> Array:
    """Coarse-to-fine Poisson blend: solve at /2^(levels-1) first and refine.

    Plain Jacobi needs O(width^2) sweeps to propagate boundary information;
    the pyramid carries the low-frequency solution up in O(levels) solves,
    so 1024^2 composites converge in a few hundred total sweeps.
    """
    from hairfastgan_tpu.ops.resample import resize

    h, w = src.shape[1], src.shape[2]
    out = None
    for lvl in reversed(range(levels)):
        s = 2 ** lvl
        hs, ws = h // s, w // s
        src_l = resize(src, (hs, ws), "bilinear")
        dst_l = resize(dst, (hs, ws), "bilinear")
        m_l = (resize(mask, (hs, ws), "nearest") > 0.5).astype(src.dtype)
        if out is None:
            init_dst = dst_l
        else:
            up = resize(out, (hs, ws), "bilinear")
            init_dst = m_l * up + (1 - m_l) * dst_l
        # reuse the Jacobi core with the level's own boundary field
        target_lap = _lap(src_l)

        def body(x, _):
            x_new = (_neighbor_sum(x) + target_lap) / 4.0
            return m_l * x_new + (1 - m_l) * dst_l, None

        start = m_l * (init_dst if out is not None else src_l) + (1 - m_l) * dst_l
        out, _ = jax.lax.scan(body, start, None, length=n_iters)
    return jnp.clip(out, 0.0, 1.0)
