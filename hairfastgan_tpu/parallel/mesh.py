"""Device-mesh construction and sharding plans.

The reference is single-process/single-GPU (SURVEY.md §2.10); its only
scale levers are NCCL DDP in vendored trainers. Here parallelism is a
first-class subsystem: a `Mesh` with a `data` axis (triples are independent
→ batch sharding is the main throughput lever) and an optional `model` axis
used to shard the widest parameter matrices (the 18× Linear(8640→512) FSE
style heads, CLIP/e4e trunks) and the high-resolution feature maps.

All entry points produce `NamedSharding`s consumed by `jax.jit`'s
in_shardings/out_shardings — XLA inserts the ICI collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the canonical shardings for pipeline tensors."""

    mesh: Mesh

    @property
    def data_axis(self) -> str:
        return "data"

    @property
    def model_axis(self) -> Optional[str]:
        return "model" if "model" in self.mesh.axis_names else None

    def batch(self, ndim: int = 4) -> NamedSharding:
        """Shard dim 0 (the triple batch) over `data`; replicate the rest."""
        return NamedSharding(self.mesh, P("data", *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def spec_batch(self, ndim: int = 4) -> P:
        return P("data", *([None] * (ndim - 1)))

    def spatial(self) -> NamedSharding:
        """Shard the H axis of NHWC activations over the model axis.

        The image analog of context parallelism (SURVEY.md §5.7): for
        >=512^2 conv layers whose activations exceed per-chip HBM, XLA's
        SPMD partitioner inserts halo exchanges over ICI for the 3x3 convs.
        Apply via jax.lax.with_sharding_constraint on feature maps / the
        render output.
        """
        axis = self.model_axis or self.data_axis
        return NamedSharding(self.mesh, P(None, axis, None, None))


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshPlan:
    """Build a 1-D data mesh or a 2-D (data, model) mesh.

    Replaces the reference's `torch.distributed.init_process_group('nccl')`
    (CtrlHair shape_branch/train.py:40 et al.); with JAX the mesh is
    declarative and collectives are emitted by the compiler.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    devs = devs[: n_data * n_model]
    if n_model > 1:
        arr = np.array(devs).reshape(n_data, n_model)
        return MeshPlan(Mesh(arr, ("data", "model")))
    arr = np.array(devs).reshape(n_data)
    return MeshPlan(Mesh(arr, ("data",)))


def data_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence[jax.Device]] = None) -> MeshPlan:
    """1-D data mesh sized to the LARGEST divisor of `batch_size` that fits
    the device count (shard_batch needs dim-0 divisibility; make_mesh slices
    devs[:n_data], so the divisor need not divide the device count itself).

    gcd(batch, n_devices) silently over-shrinks: batch 6 on 8 chips would
    train on 2 devices and a prime batch on 1. Here batch 6 on 8 chips gets
    all 6; a warning prints whenever devices are left idle so real-hardware
    runs surface the footgun instead of silently underusing the mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    n_data = max(d for d in range(1, min(batch_size, len(devs)) + 1)
                 if batch_size % d == 0)
    if n_data < len(devs):
        print(f"[mesh] data mesh uses {n_data}/{len(devs)} devices "
              f"(largest divisor of batch_size={batch_size}); pick a batch "
              f"divisible by the device count to use the full mesh",
              flush=True)
    return make_mesh(n_data=n_data, devices=devs)


def data_parallel(plan: MeshPlan, fn, in_batched: Sequence[bool]):
    """Wrap a batchwise-independent `fn` as a jitted shard_map over `data`.

    `in_batched[i]` marks whether positional arg i carries the batch on dim
    0 (sharded over `data`); other args (weights pytrees, PRNG keys) are
    replicated. Returns a jitted callable whose per-device program is the
    plain per-shard computation.

    Why not rely on jit + input shardings and XLA's SPMD propagation?
    Measured on the composed swap program (8-device mesh): the partitioner
    reshards internals and emits 260 all-to-all + 434 collective-permute
    ops for a program with ZERO inherent cross-sample dependencies — wasted
    ICI traffic on real hardware, and on the CPU test backend the
    in-process rendezvous for those collectives intermittently trips its
    fatal stuck-detection (SIGABRT). shard_map pins the collective-free
    program by construction.
    """
    in_specs = tuple(P("data") if b else P() for b in in_batched)
    return jax.jit(jax.shard_map(
        fn, mesh=plan.mesh, in_specs=in_specs, out_specs=P("data")))


def shard_batch(plan: MeshPlan, tree):
    """Place a pytree of batched arrays with dim-0 sharded over `data`."""
    return jax.tree.map(
        lambda x: jax.device_put(x, plan.batch(np.ndim(x))), tree
    )


def replicate(plan: MeshPlan, tree):
    return jax.device_put(tree, plan.replicated())


def _model_spec_for(path_str: str, x) -> P:
    """Heuristic model-axis sharding: split the last (output-feature) dim of
    large 2-D matrices and the output-channel dim of conv kernels when they
    are divisible by the axis size; everything else replicated. Used only
    when a `model` axis exists."""
    if x.ndim == 2 and x.shape[-1] >= 512:
        return P(None, "model")
    if x.ndim == 4 and x.shape[-1] >= 512:
        return P(None, None, None, "model")
    return P()


def shard_params_model_axis(plan: MeshPlan, params):
    """Tensor-parallel placement of a parameter pytree over the model axis.

    Output-feature sharding keeps matmuls local (row-parallel inputs arrive
    replicated; the subsequent contraction over the sharded dim inserts a
    psum) — the standard Megatron column/row pattern expressed purely as
    shardings for XLA's SPMD partitioner.
    """
    if plan.model_axis is None:
        return replicate(plan, params)

    axis = plan.mesh.shape["model"]

    def place(x):
        spec = _model_spec_for("", x)
        # only shard if divisible, else replicate
        for dim, name in enumerate(spec):
            if name == "model" and x.shape[dim] % axis != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(plan.mesh, spec))

    return jax.tree.map(place, params)
