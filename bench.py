"""Benchmark harness — prints ONE JSON line for the driver.

Current flagship metric: p50 wall time of a full 1024x1024 StyleGAN2
config-f synthesis (the op mix that dominates HairFast's swap; see
SURVEY.md §3.2 hot loops). Baseline context: the PyTorch reference performs
a full hair transfer (4-6 generator slices + encoder trunks) in <1000 ms on
a V100 (reference README.md:9); `vs_baseline` reports 1000/value as a
speedup proxy until the full pipeline bench replaces this.

Protocol mirrors utils/time.py:14-36: warmup, N timed synced runs, p50.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import StyleGANConfig
from hairfastgan_tpu.models import stylegan2 as sg2


def main():
    cfg = StyleGANConfig()
    key = jax.random.PRNGKey(3407)
    params = sg2.init_generator_params(key, cfg)
    params = jax.device_put(params)
    n_iters = 20
    # distinct latents per iteration so no execution-result cache can short-cut
    latents = [
        jax.device_put(jax.random.normal(jax.random.PRNGKey(i),
                                         (1, cfg.n_latent, cfg.style_dim)) * 0.01)
        for i in range(n_iters + 2)
    ]

    def render(p, l):
        img = sg2.generate(p, l, cfg=cfg, dtype=jnp.bfloat16)
        return img, jnp.sum(img[0, 0, 0])  # scalar probe forcing full execution

    fn = jax.jit(render)
    # warmup / compile
    for i in range(2):
        _, probe = fn(params, latents[n_iters + i])
        float(probe)

    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        _, probe = fn(params, latents[i])
        float(probe)  # host fetch of 1 scalar == hard sync through the tunnel
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    p50 = times[len(times) // 2]

    print(json.dumps({
        "metric": "stylegan2_1024_render_p50_ms",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(1000.0 / p50, 3),
    }))


if __name__ == "__main__":
    main()
