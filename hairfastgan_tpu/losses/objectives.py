"""Adversarial / segmentation / reconstruction objectives.

Rebuilds reference losses/pp_losses.py:298-363,544-587:
  * softplus logistic GAN losses (EncoderAdvLoss :306, AdvLoss :311-328)
  * R1 gradient penalty via jax.grad (R1Loss :552-573; the reference's
    `*16` batch factor and coef/2 are kept)
  * DiceLoss over softmaxed BiSeNet-16 logits with focal fn/fp terms (:330-363)
  * DilatedMask: disc-kernel smoothing ** 0.25 (:576-587)
  * FeatReconLoss: plain MSE (:298-303)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def adv_g_loss(fake_preds: Array) -> Array:
    return jnp.mean(jax.nn.softplus(-fake_preds))


def adv_d_loss(real_preds: Array, fake_preds: Array) -> Array:
    return (jnp.mean(jax.nn.softplus(-real_preds))
            + jnp.mean(jax.nn.softplus(fake_preds))) / 2.0


def r1_penalty(disc_fn, params, real_images: Array, coef: float = 10.0) -> Array:
    """coef/2 * E||∇_x D(x)||^2 * 16 (pp_losses.py:560-573)."""

    def pred_mean(imgs):
        p = disc_fn(params, imgs)
        return jnp.sum(jnp.mean(p.reshape(p.shape[0], -1), axis=1))

    grad = jax.grad(pred_mean)(real_images)
    penalty = jnp.mean(jnp.sum(jnp.square(grad).reshape(grad.shape[0], -1), axis=1))
    return coef / 2.0 * penalty * 16.0


def feat_recon_loss(f1: Array, f2: Array) -> Array:
    return jnp.mean(jnp.square(f1 - f2))


def dice_loss(in_logit: Array, tg_logit: Array, gamma: float = 2.0,
              smooth: float = 1.0) -> Array:
    """Focal dice over softmax probs, channels-last [B,H,W,K]."""
    p1 = jax.nn.softmax(in_logit, axis=-1)
    p2 = jax.nn.softmax(tg_logit, axis=-1)
    i = p1.reshape(p1.shape[0], -1)
    t = p2.reshape(p2.shape[0], -1)
    inter = jnp.sum(i * t, axis=1)
    fn = jnp.sum((t * (1 - i)) ** gamma, axis=1)
    fp = jnp.sum(((1 - t) * i) ** gamma, axis=1)
    dice = 1 - (2 * inter + smooth) / (jnp.sum(i, axis=1) + jnp.sum(t, axis=1)
                                       + fn + fp + smooth)
    return jnp.mean(dice)


@functools.lru_cache(maxsize=None)
def _disc_kernel(kernel_size: int) -> np.ndarray:
    c = np.arange(kernel_size) - kernel_size // 2
    xx, yy = np.meshgrid(c, c)
    k = ((xx ** 2 + yy ** 2) <= (kernel_size // 2) ** 2).astype(np.float32)
    return k / k.sum()


def dilated_mask(mask: Array, kernel_size: int = 25) -> Array:
    """Disc-kernel smoothing ** 0.25 on [B,H,W,1] masks (pp_losses.py:576-587)."""
    k = jnp.asarray(_disc_kernel(kernel_size), mask.dtype)[..., None, None]
    smooth = jax.lax.conv_general_dilated(
        mask, k, (1, 1), [(kernel_size // 2,) * 2] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return smooth ** 0.25
