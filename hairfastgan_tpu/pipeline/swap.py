"""Full hair-transfer pipeline: one jittable device-resident program.

Composes Embedding -> Alignment -> Blending -> PostProcess
(reference hair_swap.py:39-61) over a batch of (face, shape, color) image
triples. The reference's object-identity dedup fast paths (hair_swap.py:54,
Embedding.py:85, Alignment.py:116, Blending.py:56) become the static `case`
argument — each case compiles to its own fully-static XLA program:

  'distinct'        all three images differ (the general path)
  'shape_eq_color'  shape is color        -> one shape module, reuse HM_X
  'face_eq_shape'   face is shape         -> F_align = F_face fast path
  'face_eq_color'   face is color         -> color shape-module same path
  'same'            all equal             -> reconstruction-only path

Inputs are [B,1024,1024,3] float images in [0,1] (batched triples: every
stage runs all B transfers at once — the TPU throughput lever the eager
reference lacks).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.pipeline.alignment import (align_images, shape_module,
                                                shape_module_pair)
from hairfastgan_tpu.pipeline.blending import blend_images
from hairfastgan_tpu.pipeline.embedding import embed_images

Array = jax.Array

CASES = ("distinct", "shape_eq_color", "face_eq_shape", "face_eq_color", "same")


def swap_cases(face, shape, color) -> str:
    """Pick the static specialization from host-side identity (or equality)."""
    if face is shape and shape is color:
        return "same"
    if shape is color:
        return "shape_eq_color"
    if face is shape:
        return "face_eq_shape"
    if face is color:
        return "face_eq_color"
    return "distinct"


def hair_fast(
    zoo: Dict,
    face: Array,
    shape: Array,
    color: Array,
    *,
    case: str = "distinct",
    cfg: HairFastConfig = HairFastConfig(),
    dtype=jnp.float32,
    noise_key: Optional[Array] = None,
    return_intermediate: bool = False,
    sp=None,
):
    """One batched hair transfer -> [B,1024,1024,3] in [0,1].

    return_intermediate=True additionally returns the per-stage artifacts
    the reference dumps under save_all (Embedding.py:103-116,
    Alignment.py:85-93,161-179, Blending.py:71-78).

    `sp` (parallel/spatial.SpatialPlan; requires running inside a shard_map
    over sp.axis — use parallel.spatial.make_sharded_swap) H-bands the
    ≥from_res generator renders across the mesh: the multi-chip latency
    path. The returned image is this device's row band (out_specs
    assemble); zero-noise only and no intermediates.
    """
    if case not in CASES:
        raise ValueError(f"case must be one of {CASES}, got {case!r}")
    if sp is not None and (noise_key is not None or return_intermediate):
        raise ValueError("spatially-sharded swap supports the deterministic "
                         "zero-noise path without intermediates only")
    b = face.shape[0]

    # Embedding: run the <=3 distinct images as ONE batch through the zoo
    if case == "same":
        emb = embed_images(zoo, face, mix=False, cfg=cfg, dtype=dtype)
        e_face = e_shape = e_color = emb
    elif case == "shape_eq_color":
        stacked = jnp.concatenate([face, shape], axis=0)
        emb = embed_images(zoo, stacked, mix=True, cfg=cfg, dtype=dtype)
        e_face = {k: v[:b] for k, v in emb.items()}
        e_shape = e_color = {k: v[b:] for k, v in emb.items()}
    elif case == "face_eq_shape":
        stacked = jnp.concatenate([face, color], axis=0)
        emb = embed_images(zoo, stacked, mix=True, cfg=cfg, dtype=dtype)
        e_face = e_shape = {k: v[:b] for k, v in emb.items()}
        e_color = {k: v[b:] for k, v in emb.items()}
    elif case == "face_eq_color":
        stacked = jnp.concatenate([face, shape], axis=0)
        emb = embed_images(zoo, stacked, mix=True, cfg=cfg, dtype=dtype)
        e_face = e_color = {k: v[:b] for k, v in emb.items()}
        e_shape = {k: v[b:] for k, v in emb.items()}
    else:
        stacked = jnp.concatenate([face, shape, color], axis=0)
        emb = embed_images(zoo, stacked, mix=True, cfg=cfg, dtype=dtype)
        e_face = {k: v[:b] for k, v in emb.items()}
        e_shape = {k: v[b:2 * b] for k, v in emb.items()}
        e_color = {k: v[2 * b:] for k, v in emb.items()}

    keys = (jax.random.split(noise_key, 3) if noise_key is not None
            else (None, None, None))

    # Alignment (face, shape) + the color image's shape module
    # (hair_swap.py:41-57). In the fully-distinct case both shape modules
    # can batch into ONE B=2b program (alignment.shape_module_pair) —
    # MEASURED SLOWER on v5e (p50 114.5 -> 120.3 ms: the 1024^2 B=2
    # rotated render tiles worse than two sequential B=1 renders, same
    # HBM-pressure cliff as batch 16) — so it is opt-in via
    # cfg.pair_shape_modules; the default keeps the sequential calls, with
    # face==color / face==shape short-circuits mirroring the reference's
    # identity checks (Alignment.py:60,73).
    if case == "distinct" and cfg.pair_shape_modules and sp is None:
        # keys[1] feeds the one batched rotate-render (its [2b,...] draw
        # covers both pairs independently); keys[0] stays with align's SEAN
        # decode, mirroring the sequential path's assignment. Exact match
        # with the sequential path holds at the default zero noise only —
        # see shape_module_pair's docstring.
        sm_shape, align_color = shape_module_pair(
            zoo, e_face, e_shape, e_color, cfg=cfg, dtype=dtype,
            noise_key=keys[1])
        align_shape = align_images(
            zoo, e_face, e_shape, same=False, cfg=cfg, dtype=dtype,
            noise_key=keys[0], sm=sm_shape)
    else:
        align_shape = align_images(
            zoo, e_face, e_shape, same=case in ("face_eq_shape", "same"),
            cfg=cfg, dtype=dtype, noise_key=keys[0], sp=sp)
        if case in ("shape_eq_color", "same"):
            align_color = align_shape
        else:
            align_color = shape_module(
                zoo, e_face, e_color, same=(case == "face_eq_color"),
                cfg=cfg, dtype=dtype, noise_key=keys[1], sp=sp)

    # Blending + PostProcess
    out = blend_images(
        zoo, align_shape, align_color, e_face, e_color,
        all_same=(case == "same"), cfg=cfg, dtype=dtype, noise_key=keys[2],
        return_intermediate=return_intermediate, sp=sp)
    if not return_intermediate:
        return out
    final, blend_inter = out
    inter = {
        "W_face": e_face["W"], "S_face": e_face["S"], "F_face": e_face["F"],
        "W_shape": e_shape["W"], "S_shape": e_shape["S"], "F_shape": e_shape["F"],
        "W_color": e_color["W"], "S_color": e_color["S"], "F_color": e_color["F"],
        "mask_face": e_face["mask"], "mask_shape": e_shape["mask"],
        "mask_color": e_color["mask"],
        "latent_F_align": align_shape["latent_F_align"],
        "HM_X": align_color["HM_X"],
        **blend_inter,
    }
    return final, inter
