"""ArcFace IR-SE-50 identity loss (TreB1eN Backbone variant).

Rebuilds IDLoss of reference losses/pp_losses.py:267-296: crop the face
region [35:223, 32:220] of the 256 image, adaptive-pool to 112, embed with
IR-SE-50 (input_layer + 24 bottlenecks + BN/flatten/linear/BN head), then
1 - cosine between (already unit-ish) embeddings.

The trunk reuses models/e4e.py's bottleneck_IR_SE blocks — the reference
instantiates this backbone twice (e4e encoder + IDLoss); here it is one
implementation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from hairfastgan_tpu.models.e4e import init_irse_body, irse_stem, bottleneck_ir
from hairfastgan_tpu.models.layers import init_bn, init_linear
from hairfastgan_tpu.ops.basic import adaptive_avg_pool, batch_norm, linear

Array = jax.Array


def init_irse_backbone(key, embed_dim: int = 512, width: float = 1.0):
    """width<1 thins the trunk (micro test configs only — converted
    checkpoints always load at width 1; mirrors bisenet's width knob)."""
    k1, k2 = jax.random.split(key)
    c512 = max(16, int(512 * width))
    return {
        "body": init_irse_body(k1, se=True, width=width),
        "bn_out": init_bn(c512),
        "fc": init_linear(k2, c512 * 7 * 7, embed_dim),
        "bn_feat": init_bn(embed_dim),
    }


def irse_embed(p, x112: Array) -> Array:
    """[B,112,112,3] in [-1,1] -> [B,512] (l2-unnormalized) embedding."""
    y = irse_stem(p["body"], x112)
    for blk in p["body"]["body"]:
        y = bottleneck_ir(blk, y)
    y = batch_norm(p["bn_out"], y)
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)  # NCHW flatten
    y = linear(p["fc"], y)
    return batch_norm(p["bn_feat"], y)


def extract_id_feats(p, img256: Array) -> Array:
    """Crop + pool to 112 then embed (pp_losses.py:279-283), NHWC rows/cols."""
    crop = img256[:, 35:223, 32:220, :]
    x = adaptive_avg_pool(crop, (112, 112))
    return irse_embed(p, x)


def id_loss(p, y_hat256: Array, y256: Array) -> Array:
    """mean(1 - <e(y_hat), e(y)>) (pp_losses.py:285-296); y is stop-grad.

    Both images go through ONE batched backbone pass (the reference runs
    two sequential forwards)."""
    n = y_hat256.shape[0]
    feats = extract_id_feats(p, jnp.concatenate([y_hat256, y256], axis=0))
    a = feats[:n]
    b = jax.lax.stop_gradient(feats[n:])
    return jnp.mean(1.0 - jnp.sum(a * b, axis=-1))


def convert_irse_backbone(sd) -> Dict:
    """TreB1eN ir_se50.pth state_dict -> params.

    Keys: input_layer.{0 conv,1 bn,2 prelu}, body.N.*, output_layer.{0 bn,
    3 linear, 4 bn1d}.
    """
    from hairfastgan_tpu.models.e4e import _blocks_50
    from hairfastgan_tpu.params.convert import (
        _t_bottleneck_ir, t_bn, t_conv, t_linear, t_prelu)
    from hairfastgan_tpu.models.layers import Static

    body = []
    for i, (_, _, stride) in enumerate(_blocks_50()):
        b = _t_bottleneck_ir(sd, f"body.{i}")
        b["stride"] = Static(stride)
        body.append(b)
    return {
        "body": {
            "input": {"conv": t_conv(sd, "input_layer.0"),
                      "bn": t_bn(sd, "input_layer.1"),
                      "prelu": t_prelu(sd, "input_layer.2")},
            "body": body,
        },
        "bn_out": t_bn(sd, "output_layer.0"),
        "fc": t_linear(sd, "output_layer.3"),
        "bn_feat": t_bn(sd, "output_layer.4"),
    }
