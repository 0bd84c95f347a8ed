"""Spatial (H-band) sharding of the composed swap — the multi-chip latency path.

The reference has no distributed inference at all (SURVEY.md §2.10); its hot
loop is the sequence of StyleGAN2 generator slices inside one swap
(hair_swap.py:39-61). On a (data=1, model=N) mesh the batch axis is useless
for LATENCY — the lever is splitting the ≥512² synthesis pairs (where the
render FLOPs/HBM live) across chips by image rows.

Design: **halo-recompute domain decomposition**, not partitioner-inserted
halo exchange. Each device renders its own H-band of the high-resolution
pairs from a replicated lower-resolution feature map, slicing its band plus
`halo` extra rows and discarding the contaminated margin afterwards. The
band entry point is where maps are smallest, so the redundant margin costs
a few percent of FLOPs and buys ZERO collectives inside the conv stack —
the only ICI traffic is one all-gather per render that downstream
non-local stages (BiSeNet re-segmentation, PostProcess) consume, and none
at all for the final render (the output stays banded; the out_specs
assemble it). Why not `with_sharding_constraint` + XLA SPMD halo exchange:
(a) measured on this toolchain the partitioner reshards composed-pipeline
internals aggressively (260 all-to-all + 434 collective-permute on the DP
swap, CLAUDE.md), and (b) per-conv halo exchanges serialize ICI latency
into every layer, where recompute rides the MXU we already occupy.

Correctness rests on translation-locality of the synthesis tail: modulated
convs (3x3), FIR blurs (4-tap), noise-free path, and to_rgb skips are all
row-local; a band computed from `band + 2*halo` input rows equals the same
rows of the full render once `halo` covers the receptive-field margin
(edge devices clamp to the true array edge, so the real zero-pad behavior
is preserved there). Equality is pinned by tests/test_mesh_equivalence.py
(sharded swap == single-device golden) and the halo bound is asserted, not
assumed — an insufficient halo fails the equality test immediately.

Latency model (written for ARCHITECTURE.md §multi-chip): per sharded render
with tail entry at resolution R_e and output R_o over n chips,
  compute   ≈ (1/n + 2*halo/R_e) of the tail's FLOPs    (margin shrinks
              relative to band as resolution doubles: halo is fixed rows
              at entry, band doubles per pair)
  ICI bytes = B * R_o * R_o/n * 3 * dtype  sent per chip for the gathered
              renders (all_gather, ~6 MB f32 / 3 MB bf16 at 1024²), zero
              for the final render.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from hairfastgan_tpu.config import HairFastConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SpatialPlan:
    """How to band the high-resolution synthesis pairs across a mesh axis.

    axis:     mesh axis name the H bands live on ('model' on a
              (data, model) mesh; 'data' for a pure single-swap mesh)
    n:        number of band shards (mesh size along `axis`)
    from_res: first pair OUTPUT resolution that gets banded (512 on the
              full config per SURVEY §5.7 — ≥512² activations; tests use
              64 so the micro zoo exercises the machinery)
    halo:     extra rows sliced on each side of the band at the tail ENTRY
              resolution; must cover the receptive-field contamination of
              the banded pairs (~3 rows per pair at that pair's input res;
              8 covers any ≤3-pair tail with margin)
    """

    axis: str
    n: int
    from_res: int = 512
    halo: int = 8


def _pair_res(pair: int) -> int:
    return 4 * (2 ** pair)


def _band_slice(x: Array, idx: Array, band: int, halo: int):
    """Slice rows [idx*band - halo, idx*band + band + halo) of axis 1,
    clamped into the array (edge devices keep the true array edge, so
    boundary zero-padding semantics are preserved). Returns (slice,
    keep_offset): keep_offset is where this device's own band starts
    inside the slice."""
    h = x.shape[1]
    size = min(h, band + 2 * halo)
    start = jnp.clip(idx * band - halo, 0, h - size)
    return lax.dynamic_slice_in_dim(x, start, size, axis=1), idx * band - start


def sharded_synthesis(
    sp: SpatialPlan,
    gen,
    latent: Array,
    *,
    start_layer: int = 0,
    end_layer: int = 8,
    layer_in: Optional[Array] = None,
    cfg,
    dtype=jnp.float32,
    gather: bool = True,
) -> Array:
    """Banded replacement for the rgb output of `stylegan2.synthesis`.

    Runs pairs below `from_res` replicated (identical compute on every
    device — they are cheap and replication is free of ICI traffic), then
    slices this device's band+halo and renders the remaining pairs on the
    band only. gather=True all-gathers the full image (for renders whose
    consumers are non-local: BiSeNet, PostProcess); gather=False returns
    the banded rows (the final render — out_specs assemble it).

    Must be called inside a shard_map over sp.axis. Zero-noise path only
    (the stochastic noise_key mode would need row-consistent noise slices;
    callers assert).
    """
    from hairfastgan_tpu.models import stylegan2

    last = min(end_layer, cfg.log_size - 2)
    band_pair = None
    for p in range(max(start_layer, 1), last + 1):
        if _pair_res(p) >= sp.from_res:
            band_pair = p
            break
    if band_pair is None:  # nothing reaches from_res: plain replicated render
        _, rgb = stylegan2.synthesis(gen, latent, start_layer=start_layer,
                                     end_layer=end_layer, layer_in=layer_in,
                                     cfg=cfg, dtype=dtype)
        return rgb

    idx = lax.axis_index(sp.axis)
    if band_pair > start_layer:
        out, skip = stylegan2.synthesis(gen, latent, start_layer=start_layer,
                                        end_layer=band_pair - 1,
                                        layer_in=layer_in, cfg=cfg, dtype=dtype)
    else:
        out, skip = layer_in.astype(dtype), None

    h_in = out.shape[1]
    if h_in % sp.n:
        raise ValueError(f"band entry rows {h_in} not divisible by n={sp.n}")
    band = h_in // sp.n
    out_b, keep = _band_slice(out, idx, band, sp.halo)
    skip_b = (_band_slice(skip, idx, band, sp.halo)[0]
              if skip is not None else None)

    _, rgb = stylegan2.synthesis(gen, latent, start_layer=band_pair,
                                 end_layer=end_layer, layer_in=out_b,
                                 skip=skip_b, cfg=cfg, dtype=dtype)
    scale = rgb.shape[1] // out_b.shape[1]
    rgb_keep = lax.dynamic_slice_in_dim(rgb, keep * scale, band * scale, axis=1)
    if gather:
        return lax.all_gather(rgb_keep, sp.axis, axis=1, tiled=True)
    return rgb_keep


def make_sharded_swap(
    plan,
    *,
    case: str = "distinct",
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
    from_res: int = 512,
    halo: int = 8,
):
    """jitted shard_map of ONE composed swap with its ≥from_res renders
    H-banded over the mesh's model axis (data axis on a 1-D mesh).

    Inputs replicate (in_specs P()); the final image comes back banded
    (out_specs P(None, axis)) — fetching assembles it. Expected collectives
    in the compiled program for case='distinct': exactly 3 all-gathers (two
    rotate-render re-segmentation inputs + the I_blend the PostProcess
    encoder consumes); the final render ships nothing. Pinned by
    tests/test_mesh_equivalence.py::test_sharded_swap_hlo_collectives.
    """
    from hairfastgan_tpu.pipeline.swap import hair_fast

    axis = plan.model_axis or plan.data_axis
    n = plan.mesh.shape[axis]
    sp = SpatialPlan(axis=axis, n=n, from_res=from_res, halo=halo)

    def fn(zoo, face, shape, color):
        return hair_fast(zoo, face, shape, color, case=case, cfg=cfg,
                         dtype=dtype, sp=sp)

    return jax.jit(jax.shard_map(
        fn, mesh=plan.mesh, in_specs=(P(),) * 4,
        out_specs=P(None, axis)))
