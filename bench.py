"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: p50 wall time of ONE full 1024x1024 hair transfer
(Embedding -> Alignment -> Blending -> PostProcess, all 10 model families,
'distinct' case) on one TPU chip, bf16 compute. Baseline: the PyTorch
reference "performs in less than a second" per transfer on an NVIDIA V100
(reference README.md:9); vs_baseline = 1000ms / p50.

Protocol mirrors utils/time.py:14-36 (device-synced laps, p50 of a warm
session). Weights are random-initialized (identical op mix/compute to
converted checkpoints); distinct inputs per lap + a scalar host fetch per
lap defeat any execution caching through the axon tunnel.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.pipeline import hair_fast
from hairfastgan_tpu.zoo import init_zoo_fast


def _enable_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/hairfast_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without the persistent cache


def main():
    _enable_compile_cache()
    cfg = HairFastConfig()
    # numpy shape-based init (seconds), one bulk transfer to the chip
    zoo = jax.device_put(init_zoo_fast(0, cfg))

    n_iters = 10
    size = cfg.stylegan.size
    triples = [
        tuple(jax.device_put(jax.random.uniform(jax.random.PRNGKey(3 * i + j),
                                                (1, size, size, 3)))
              for j in range(3))
        for i in range(n_iters + 1)
    ]

    def swap(zoo, face, shape, color):
        out = hair_fast(zoo, face, shape, color, case="distinct", cfg=cfg,
                        dtype=jnp.bfloat16)
        return out, jnp.sum(out[:, ::97, ::97])  # scalar probe forces full exec

    fn = jax.jit(swap)
    _, probe = fn(zoo, *triples[n_iters])  # compile + warm
    float(probe)

    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        _, probe = fn(zoo, *triples[i])
        float(probe)  # hard sync through the tunnel
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    p50 = times[len(times) // 2]

    print(json.dumps({
        "metric": "hairfast_swap_1024_p50_ms",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(1000.0 / p50, 3),
    }))


if __name__ == "__main__":
    main()
