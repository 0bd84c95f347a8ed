"""Rotate (pose) encoder training — JAX port of scripts/rotate_train.py.

Two alternating objectives (rotate_train.py:128-198):
  * pose pairs: rotate W_from toward W_to, full G render, 256 downsample;
    keypoint MSE (76 2-D landmarks) + 20x ArcFace cosine identity loss
  * hair pairs: 300x latent MSE between rotate(W_from->W_to) and W_to[:6]

Loss magnitudes are balanced by MovingAverageLoss EMA targets
({'mse points to': 6, 'mse latents': 2}, rotate_train.py:98).

The keypoint extractor is pluggable: the reference's STAR landmark model is
training-only and broken-as-shipped (undefined `utility.landmarks_arg`,
SURVEY.md known defects); any fn images256->[B,76,2] works here.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.losses.identity import irse_embed
from hairfastgan_tpu.models import encoders, stylegan2
from hairfastgan_tpu.ops.basic import adaptive_avg_pool
from hairfastgan_tpu.pipeline.embedding import to_res
from hairfastgan_tpu.train.common import adam_with_clip, make_train_step

Array = jax.Array


def _arcface_cosine(frozen, img256_01: Array, ref256_01: Array) -> Array:
    """20 * (1 - cos) identity loss at 112 (rotate_train.py:71-74,147-150)."""
    def embed(x01):
        x = adaptive_avg_pool(x01, (112, 112)) * 2.0 - 1.0
        return irse_embed(frozen["arcface"], x)

    a = embed(img256_01)
    b = jax.lax.stop_gradient(embed(ref256_01))
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return 20.0 * jnp.mean(1.0 - jnp.sum(an * bn, axis=-1))


def rotate_pose_loss(
    params,
    frozen: Dict,
    batch: Tuple[Array, ...],
    keypoint_fn: Callable[[Dict, Array], Array],
    cfg: HairFastConfig = HairFastConfig(),
    mults=None,
) -> Tuple[Array, Dict[str, Array]]:
    """batch: (I_from 256 [0,1], key_points_to [B,76,2], W_from, W_to).

    `mults` ([2]: points, arc_face) are the MovingAverageLoss per-term
    scalars (rotate_train.py:155-156 normalize=True); None sums raw terms
    (the reference's validation normalize=False path).
    """
    i_from, kp_to, w_from, w_to = batch
    rot = encoders.rotate_model(params, w_from[:, :6], w_to[:, :6])
    latent_in = jnp.concatenate([rot, w_from[:, 6:]], axis=1)
    _, i_g = stylegan2.synthesis(frozen["generator"], latent_in, cfg=cfg.stylegan)
    i_gen = jnp.clip(to_res((i_g + 1.0) / 2.0, 256), 0, 1)

    kp_gen = keypoint_fn(frozen, i_gen)  # any STAR params come from frozen
    kp_loss = jnp.mean(jnp.square(kp_gen - kp_to))
    id_loss = _arcface_cosine(frozen, i_gen, i_from)
    total = (kp_loss + id_loss if mults is None
             else mults[0] * kp_loss + mults[1] * id_loss)
    return total, {"mse_points": kp_loss, "arc_face": id_loss}


def rotate_hair_loss(params, batch: Tuple[Array, Array],
                     mults=None) -> Tuple[Array, Dict]:
    """Same-pose pairs: 300x MSE(rotate(W_from, W_to), W_to[:6])."""
    w_from, w_to = batch
    rot = encoders.rotate_model(params, w_from[:, :6], w_to[:, :6])
    loss = 300.0 * jnp.mean(jnp.square(rot - w_to[:, :6]))
    total = loss if mults is None else mults[0] * loss
    return total, {"mse_latents": loss}


def rotate_render(params, frozen: Dict, w_from: Array, w_to: Array,
                  cfg: HairFastConfig = HairFastConfig()) -> Array:
    """Validation render: rotate + full G + 256 downsample, [0,1]."""
    rot = encoders.rotate_model(params, w_from[:, :6], w_to[:, :6])
    latent_in = jnp.concatenate([rot, w_from[:, 6:]], axis=1)
    _, i_g = stylegan2.synthesis(frozen["generator"], latent_in, cfg=cfg.stylegan)
    return jnp.clip(to_res((i_g + 1.0) / 2.0, 256), 0, 1)


def make_rotate_train_steps(frozen: Dict, keypoint_fn,
                            cfg: HairFastConfig = HairFastConfig(), lr: float = 1e-4):
    """(pose_step, hair_step, tx); each step takes the MAL multiplier array
    as its final batch argument (traced — no recompile per step).

    `frozen` (incl. any STAR params keypoint_fn reads via its `frozen`
    first argument) rides as a call-time jit argument, never a closure —
    closure arrays embed as HLO literals (see make_train_step)."""
    tx = adam_with_clip(lr)
    pose = make_train_step(
        lambda p, fr, i, kp, wf, wt, m: rotate_pose_loss(
            p, fr, (i, kp, wf, wt), keypoint_fn, cfg, mults=m), tx,
        frozen=frozen)
    hair = make_train_step(
        lambda p, wf, wt, m: rotate_hair_loss(p, (wf, wt), mults=m), tx)
    return pose, hair, tx
