"""Profile the fused swap program on the real TPU and attribute device time.

Compiles the full `hair_fast` 'distinct' program WITHOUT the persistent
compile cache (the cache key ignores metadata, so a cached executable lacks
the jax.named_scope strings attribute_trace needs), dumps its optimized
HLO, captures a jax.profiler trace over N calls with distinct inputs, and
prints per-scope + per-source-line device-time attribution.

Usage:  python tools/profile_swap.py [n_calls] [out_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    n_calls = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/hf_profile")
    out.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.pipeline import hair_fast
    from hairfastgan_tpu.zoo import cast_zoo, init_zoo_fast

    cfg = HairFastConfig()
    zoo = jax.device_put(cast_zoo(init_zoo_fast(0, cfg)))
    size = cfg.stylegan.size

    def triple(i):
        return tuple(jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(3 * i + j), (1, size, size, 3)))
            for j in range(3))

    def swap(zoo, face, shape, color):
        out_im = hair_fast(zoo, face, shape, color, case="distinct", cfg=cfg,
                           dtype=jnp.bfloat16)
        return out_im, jnp.sum(out_im[:, ::97, ::97].astype(jnp.float32))

    fn = jax.jit(swap)
    laps = [(zoo, *triple(i)) for i in range(n_calls + 1)]

    t0 = time.perf_counter()
    compiled = fn.lower(*laps[0]).compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    hlo_path = out / "swap_hlo.txt"
    hlo_path.write_text(compiled.as_text())

    _, probe = fn(*laps[0])
    float(probe)  # warm + hard sync through the tunnel

    times = []
    jax.profiler.start_trace(str(out / "trace"))
    for args in laps[1:]:
        t0 = time.perf_counter()
        _, probe = fn(*args)
        float(probe)
        times.append((time.perf_counter() - t0) * 1e3)
    jax.profiler.stop_trace()
    times.sort()
    print(f"host p50 over {n_calls} laps: {times[len(times) // 2]:.1f} ms")

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from attribute_trace import attribute, attribute_scopes

    attribute_scopes(str(out / "trace"), str(hlo_path), n_calls)
    print()
    attribute(str(out / "trace"), str(hlo_path), n_calls)


if __name__ == "__main__":
    main()
