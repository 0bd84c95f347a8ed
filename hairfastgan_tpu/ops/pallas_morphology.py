"""Pallas TPU kernel: fused N-iteration binary dilate+erode.

The XLA path (ops/morphology.py) lowers the `lax.scan` over iterations to N
sequential HLO loop steps, each round-tripping the mask through HBM. This
kernel keeps the whole mask block in VMEM and runs all iterations of BOTH
morphologies in one launch — a 256^2 f32 mask is 256 KB, far under the
~16 MB VMEM budget, so per-iteration HBM traffic drops to zero.

Grid: one program per batch element; block = the full [H, W] mask plane.
Shifts are realized as static pad+slice (VPU moves), max/min on the VPU.
Semantics identical to ops/morphology.dilate_erode (cross structuring
element, zero border for the erosion); parity-tested against it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _shift_max(x):
    up = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    dn = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    lf = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    rt = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return jnp.maximum(jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt)), x)


def _shift_min(x):
    up = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    dn = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    lf = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    rt = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return jnp.minimum(jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt)), x)


def _kernel(mask_ref, dil_ref, ero_ref, *, iterations: int):
    b = (mask_ref[0] > 0).astype(mask_ref.dtype)

    def body(_, carry):
        d, e = carry
        return _shift_max(d), _shift_min(e)

    d, e = jax.lax.fori_loop(0, iterations, body, (b, b))
    dil_ref[0] = d
    ero_ref[0] = e


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def dilate_erode_pallas(mask: Array, iterations: int = 5,
                        interpret: bool = False) -> Tuple[Array, Array]:
    """(dilated, eroded) of [B,H,W,1] masks; drop-in for dilate_erode."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic rejects the (1, H, W) bf16 block layout; masks are binary so
    # f32 compute is exact — cast in, cast back out.
    in_dtype = mask.dtype
    x = mask[..., 0].astype(jnp.float32)
    b, h, w = x.shape
    kern = functools.partial(_kernel, iterations=iterations)
    dil, ero = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), x.dtype),
            jax.ShapeDtypeStruct((b, h, w), x.dtype),
        ),
        interpret=interpret,
    )(x)
    return dil[..., None].astype(in_dtype), ero[..., None].astype(in_dtype)


def dilate_erode_auto(mask: Array, iterations: int = 5) -> Tuple[Array, Array]:
    """Dispatch to the XLA scan implementation.

    MEASURED (v5e, round 1): standalone the Pallas kernel matches the XLA
    scan (both dispatch-latency-bound at 256^2), but INSIDE the fused
    full-swap program it regressed end-to-end p50 from 116 ms to 2.2 s —
    pallas_call boundaries block XLA's cross-op fusion/scheduling around
    the call sites. The kernel stays available (`dilate_erode_pallas`) and
    parity-tested for future Mosaic revisions; the production path is XLA.
    """
    from hairfastgan_tpu.ops.morphology import dilate_erode

    return dilate_erode(mask, iterations)
