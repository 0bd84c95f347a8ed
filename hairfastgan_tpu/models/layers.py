"""Shared parameter initializers and composite blocks for the model zoo.

Pure-function convention: every module is (init_* -> param dict, apply fn).
Weights layouts: conv HWIO, linear [in, out]; see ops/basic.py. Initial
values only matter for from-scratch training of the three glue encoders;
frozen-zoo params are overwritten by the checkpoint converter
(params/convert.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from hairfastgan_tpu.ops.basic import batch_norm, conv2d_p, leaky_relu, relu

Array = jax.Array


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Static:
    """Static (non-traced) config value living inside a parameter pytree.

    jax.tree treats it as an empty subtree, so jit/grad/optimizers ignore it
    while apply functions read `.value` as a Python constant (strides, layer
    tables — anything that must stay static under tracing).
    """

    value: Any


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, scale: float = None):
    if scale is None:
        scale = 1.0 / math.sqrt(in_dim) if in_dim > 0 else 1.0
    p = {"w": jax.random.normal(key, (in_dim, out_dim), jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def init_conv(key, k, cin: int, cout: int, bias: bool = True, scale: float = 0.02):
    kh, kw = (k, k) if isinstance(k, int) else k
    p = {"w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_bn(c: int):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_prelu(c: int):
    return {"w": jnp.full((c,), 0.25, jnp.float32)}


def init_ln(c: int):
    return {"gamma": jnp.ones((c,), jnp.float32), "beta": jnp.zeros((c,), jnp.float32)}


# ---------------------------------------------------------------------------
# conv + BN (+ act) blocks, the workhorses of every perception trunk
# ---------------------------------------------------------------------------

def init_conv_bn(key, k, cin, cout):
    return {"conv": init_conv(key, k, cin, cout, bias=False), "bn": init_bn(cout)}


def conv_bn(p, x: Array, *, stride=1, padding=0) -> Array:
    return batch_norm(p["bn"], conv2d_p(p["conv"], x, stride=stride, padding=padding))


def conv_bn_relu(p, x: Array, *, stride=1, padding=0) -> Array:
    return relu(conv_bn(p, x, stride=stride, padding=padding))


def conv_bn_lrelu(p, x: Array, *, stride=1, padding=0, slope=0.2) -> Array:
    return leaky_relu(conv_bn(p, x, stride=stride, padding=padding), slope)


def mlp_ln_lrelu(key, in_dim, mid_dim, out_dim):
    """Linear -> LayerNorm(affine) -> LeakyReLU(0.01) -> Linear; the gamma/beta
    branches of ModulationModule (reference models/Encoders.py:20-21)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, in_dim, mid_dim),
        "ln": init_ln(mid_dim),
        "fc2": init_linear(k2, mid_dim, out_dim),
    }
