"""Training scaffolding shared by the three encoder training loops.

The reference trains Rotate/Blending/PostProcess with torch Adam +
clip_grad_norm(5) on a single GPU (scripts/*_train.py). Here a train step
is one jitted function over a `Mesh` — the data axis shards the batch and
the SPMD partitioner inserts the gradient psum, replacing DDP (SURVEY.md
§2.10). Loss normalization mirrors MovingAverageLoss of rotate_train.py
(per-loss EMA scaling so multi-objective magnitudes match their targets).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hairfastgan_tpu.parallel.mesh import MeshPlan

Array = jax.Array


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def adam_with_clip(lr: float = 1e-4, clip_norm: float = 5.0) -> optax.GradientTransformation:
    """Adam + global-norm clip 5 (reference scripts/*_train.py optimizers)."""
    return optax.chain(optax.clip_by_global_norm(clip_norm), optax.adam(lr))


def make_train_step(
    loss_fn: Callable[..., Tuple[Array, Dict[str, Array]]],
    tx: optax.GradientTransformation,
    donate: bool = True,
    remat: bool = False,
    frozen: Any = None,
):
    """loss_fn(params, *batch) -> (scalar, aux) => jitted update step.

    Under a mesh with batch args sharded over `data`, the mean loss makes
    XLA emit the gradient all-reduce over ICI automatically.

    frozen: optional pytree of non-trained weights, delivered to loss_fn as
    its SECOND positional argument at CALL time (loss_fn(params, frozen,
    *batch)). Do NOT close loss_fn over weight arrays: jit embeds closure
    arrays as LITERALS in the lowered HLO — the tiny-config PP step lowers
    to a 445 MB unoptimized proto that body-capped compile proxies reject
    (axon remote_compile HTTP 413; measured by tools/pp_compile_probe.py).
    As arguments the weights lower to parameters (KBs of HLO).

    remat=True rematerializes the loss computation on the backward pass
    (jax.checkpoint): ~1 extra forward of FLOPs buys back the activation
    memory of the frozen-generator renders — the HBM lever for 1024²
    adversarial PP training at larger per-chip batches. Gradients are
    identical (same math, recomputed).
    """
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def step(params, opt_state, frozen_arg, *batch):
        fargs = ((frozen_arg,) if frozen is not None else ()) + batch
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, *fargs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = dict(aux, loss=loss, grad_norm=optax.global_norm(grads))
        return params, opt_state, aux

    jitted = jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def call(params, opt_state, *batch):
        return jitted(params, opt_state, frozen, *batch)

    # expose the inner jit + bound frozen for AOT tooling
    # (tools/pp_compile_probe.py lowers the real program explicitly)
    call.jitted = jitted
    call.frozen = frozen
    return call


class MovingAverageLoss:
    """Host-side EMA loss normalization (rotate_train.py:26-42).

    The reference scales each term by weight_k / EMA_k when composing the
    training loss (`calc_loss`), with the EMA updated from the PREVIOUS
    steps' magnitudes (`update` runs after backward). `multipliers` returns
    those per-term scalars to feed into the jitted step as a traced array.
    """

    def __init__(self, weights: Dict[str, float], alpha: float = 0.02):
        self.weights_cfg = weights
        self.alpha = alpha
        self.vals: Dict[str, float] = {}

    def update(self, losses: Dict[str, float]) -> None:
        for k, v in losses.items():
            v = float(v)
            self.vals[k] = self.alpha * v + (1 - self.alpha) * self.vals.get(k, v)

    def multipliers(self, keys) -> Tuple[float, ...]:
        return tuple(self.weights_cfg.get(k, 1.0)
                     / max(self.vals.get(k, 1.0), 1e-8) for k in keys)


def check_finite_loss(loss, step: int) -> None:
    """NaN guard: raise instead of training on garbage (the reference's
    shape-branch solver raises on NaN loss, solver.py:151-156)."""
    import numpy as np

    v = float(np.asarray(loss))
    if not np.isfinite(v):
        raise FloatingPointError(f"non-finite loss {v} at step {step}")


class MetricLogger:
    """Minimal metric logger: running scalars + optional jsonl file.

    Stands in for the reference's WandbLogger (utils/train.py:31-63); wandb
    is not available in this environment, so metrics stream to a local
    jsonl that any dashboard can tail.
    """

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.step = 0
        self._file = open(path, "a") if path else None

    def log(self, **scalars):
        self.step += 1
        if self._file:
            import json

            self._file.write(json.dumps({"step": self.step, **{
                k: float(v) for k, v in scalars.items()}}) + "\n")
            self._file.flush()

    def close(self):
        if self._file:
            self._file.close()
