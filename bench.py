"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: p50 wall time of ONE full 1024x1024 hair transfer
(Embedding -> Alignment -> Blending -> PostProcess, all 10 model families,
'distinct' case) on one TPU chip, bf16 compute. Baseline: the PyTorch
reference "performs in less than a second" per transfer on an NVIDIA V100
(reference README.md:9); vs_baseline = 1000ms / p50.

The single JSON line additionally carries the full perf story:
  throughput_b{1,4,8}  transfers/s/chip from the batched-triples program
  stage_p50_ms         per-stage p50 (embed/shape/align/blend/render/seg),
                       each including the ~30 ms tunnel round-trip
  mfu_pct              XLA cost-analysis FLOPs of the fused swap program
                       over p50, as % of v5e bf16 peak (197 TFLOP/s)
  serving_p50_uint8_ms end-to-end api.swap(output="uint8") wall time — host
                       coercion + uint8 up/down transfers + device quantize

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

V5E_BF16_PEAK = 197e12  # FLOP/s per chip


def _enable_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/hairfast_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without the persistent cache


def _lap_ms(fn, args_list, warm_args):
    """Sorted wall ms, one call per args tuple (distinct inputs/lap)."""
    import math

    _, probe = fn(*warm_args)
    v = float(probe)  # compile + hard sync through the tunnel
    if not math.isfinite(v):
        raise FloatingPointError(
            f"benchmarked program produced a non-finite probe ({v}) — "
            "timing NaN work is meaningless")
    times = []
    for args in args_list:
        t0 = time.perf_counter()
        _, probe = fn(*args)
        float(probe)
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return times


def _p50_ms(fn, args_list, warm_args):
    times = _lap_ms(fn, args_list, warm_args)
    return times[len(times) // 2]


def _probe(x):
    return jnp.sum(x[(slice(None),) + (slice(None, None, 97),) * (x.ndim - 1)]
                   .astype(jnp.float32))


def main():
    _enable_compile_cache()
    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.pipeline import hair_fast
    from hairfastgan_tpu.zoo import cast_zoo, init_zoo_fast

    cfg = HairFastConfig()
    # numpy shape-based init (seconds), one bulk transfer to the chip
    # (zoo.pack_zoo intentionally NOT applied: measured slower on v5e)
    zoo = jax.device_put(cast_zoo(init_zoo_fast(0, cfg)))

    n_iters = 10
    size = cfg.stylegan.size

    def triple(i, b=1):
        return tuple(jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(3 * i + j), (b, size, size, 3)))
            for j in range(3))

    def swap(zoo, face, shape, color):
        out = hair_fast(zoo, face, shape, color, case="distinct", cfg=cfg,
                        dtype=jnp.bfloat16)
        return out, _probe(out)

    fn = jax.jit(swap)

    # ---- headline p50 (B=1) ----
    laps = [(zoo, *triple(i)) for i in range(n_iters)]
    times = _lap_ms(fn, laps, (zoo, *triple(n_iters)))
    p50, tmin = times[len(times) // 2], times[0]

    # ---- MFU from XLA's own cost model of the compiled program ----
    mfu = None
    try:
        cost = fn.lower(*laps[0]).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = round(100.0 * flops / (p50 / 1e3) / V5E_BF16_PEAK, 2)
    except Exception:
        pass

    # ---- throughput at B=1/4/8 (batched triples, one dispatch) ----
    # best-of-3 sessions with the min carried alongside: run-to-run tunnel
    # variance spans 14-16.5 transfers/s at B=8, so a single sample cannot
    # distinguish regression from noise (VERDICT r2 weak #5)
    throughput = {}
    for b in (1, 4, 8):
        p50s, mins = [], []
        for rep in range(3):
            lapsb = [(zoo, *triple(1000 * rep + 100 + i, b)) for i in range(5)]
            tb = _lap_ms(fn, lapsb, (zoo, *triple(1000 * rep + 99, b)))
            p50s.append(tb[len(tb) // 2])
            mins.append(tb[0])
        p50s.sort()
        throughput[f"throughput_b{b}"] = round(b / (p50s[1] / 1e3), 2)
        throughput[f"throughput_b{b}_max"] = round(b / (min(mins) / 1e3), 2)

    # the valley between the B=8 sweet spot and the B=16 HBM cliff was
    # never probed (VERDICT r3 #9) — one session each
    for b in (6, 10, 12):
        lapsb = [(zoo, *triple(4000 + 10 * b + i, b)) for i in range(5)]
        tb = _lap_ms(fn, lapsb, (zoo, *triple(4000 + 10 * b - 1, b)))
        throughput[f"throughput_b{b}"] = round(b / (tb[len(tb) // 2] / 1e3), 2)

    # chunked B=16 (2 x B=8 dispatches queued back-to-back, one sync at the
    # end): the swap_batch path for over-sweet-spot requests. Inputs are
    # pre-staged on device like every other throughput lap — the question
    # this answers is whether two queued B=8 programs sustain B=8
    # throughput (vs the single B=16 program's measured HBM-pressure
    # regression), not tunnel upload speed.
    def chunked16_lap(i):
        chunks = [triple(5000 + 2 * i + k, 8) for k in (0, 1)]
        t0 = time.perf_counter()
        probes = [fn(zoo, *c)[1] for c in chunks]
        for probe in probes:
            float(probe)
        return (time.perf_counter() - t0) * 1000.0

    chunked16_lap(90)  # warm (B=8 program already compiled above)
    laps16 = sorted(chunked16_lap(i) for i in range(4))
    throughput["throughput_b16_chunked8"] = round(
        16 / (laps16[len(laps16) // 2] / 1e3), 2)

    # ---- per-stage p50s (each its own program; includes tunnel RTT) ----
    from hairfastgan_tpu.models import bisenet, stylegan2
    from hairfastgan_tpu.pipeline import alignment, blending, embedding

    bf = jnp.bfloat16
    embed_fn = jax.jit(lambda z, im: (lambda e: (e, _probe(e["F"])))(
        embedding.embed_images(z, im, mix=True, cfg=cfg, dtype=bf)))
    emb_laps = [(zoo, jnp.concatenate(triple(i), axis=0)) for i in range(5)]
    stage = {"embed_b3": _p50_ms(embed_fn, emb_laps,
                                 (zoo, jnp.concatenate(triple(90), axis=0)))}

    # host-side split of one embedding into face/shape/color dicts
    emb, _ = embed_fn(zoo, jnp.concatenate(triple(0), axis=0))
    e_face = {k: v[0:1] for k, v in emb.items()}
    e_shape = {k: v[1:2] for k, v in emb.items()}
    e_color = {k: v[2:3] for k, v in emb.items()}

    def vary(e, i):
        # nudge latents so repeated laps aren't byte-identical programsinputs
        return {k: (v + (i + 1) * 1e-4 if jnp.issubdtype(v.dtype, jnp.floating)
                    else v) for k, v in e.items()}

    shape_fn = jax.jit(lambda z, a, b_: (lambda r: (r, _probe(r["target_mask"])))(
        alignment.shape_module(z, a, b_, same=False, cfg=cfg, dtype=bf)))
    stage["shape_module"] = _p50_ms(
        shape_fn, [(zoo, vary(e_face, i), vary(e_color, i)) for i in range(5)],
        (zoo, e_face, e_color))

    align_fn = jax.jit(lambda z, a, b_: (lambda r: (r, _probe(r["latent_F_align"])))(
        alignment.align_images(z, a, b_, same=False, cfg=cfg, dtype=bf)))
    stage["align"] = _p50_ms(
        align_fn, [(zoo, vary(e_face, i), vary(e_shape, i)) for i in range(5)],
        (zoo, e_face, e_shape))

    align_shape, _ = align_fn(zoo, e_face, e_shape)
    align_color, _ = shape_fn(zoo, e_face, e_color)
    blend_fn = jax.jit(lambda z, a, c, ef, ec: (lambda r: (r, _probe(r)))(
        blending.blend_images(z, a, c, ef, ec, cfg=cfg, dtype=bf)))
    stage["blend_pp"] = _p50_ms(
        blend_fn,
        [(zoo, align_shape, align_color, vary(e_face, i), vary(e_color, i))
         for i in range(5)],
        (zoo, align_shape, align_color, e_face, e_color))

    render_fn = jax.jit(lambda z, w: (lambda r: (r[1], _probe(r[1])))(
        stylegan2.synthesis(z["generator"], w, cfg=cfg.stylegan, dtype=bf)))
    n_lat = cfg.stylegan.n_latent
    stage["g_render_1024"] = _p50_ms(
        render_fn,
        [(zoo, jax.random.normal(jax.random.PRNGKey(i), (1, n_lat, 512)) * 0.1)
         for i in range(5)],
        (zoo, jnp.zeros((1, n_lat, 512))))

    seg_fn = jax.jit(lambda z, im: (lambda r: (r, _probe(r.astype(jnp.float32))))(
        bisenet.parse_to_celeba(z["bisenet"], im)))
    stage["bisenet_1024"] = _p50_ms(
        seg_fn, [(zoo, triple(i)[0]) for i in range(5)], (zoo, triple(91)[0]))

    # ---- end-to-end serving lap: api.swap with uint8 output ----
    # includes host coercion, uint8 up-transfer, device quantization and the
    # uint8 down-transfer — what a serving caller actually observes (the f32
    # output path measured ~530 ms: the tunnel transfer dominates, CLAUDE.md)
    from hairfastgan_tpu.api import HairFast

    hf = HairFast(cfg, zoo=zoo)
    np_ = __import__("numpy")
    rng = np_.random.RandomState(0)

    def serve_p50(**kw):
        laps = []
        for i in range(6):
            ims = [np_.clip(rng.rand(size, size, 3) * 255, 0, 255)
                   .astype("uint8") for _ in range(3)]
            t0 = time.perf_counter()
            hf.swap(*ims, output="uint8", **kw)
            laps.append((time.perf_counter() - t0) * 1000.0)
        laps.sort()
        # the compile lap is the largest; p50 of the remaining warm laps
        return laps[:-1][len(laps[:-1]) // 2]

    serving_p50 = serve_p50()
    # upload_res=512: host-side first downsample, 4x less upload — the
    # serving lever when the link (not the chip) is the bottleneck
    serving_p50_512 = serve_p50(upload_res=512)
    # + output_res=512: the response-side twin — the final bicubic 2x
    # downsample fuses into the swap program, so the uint8 response ships
    # 4x fewer bytes on top of the upload cut
    serving_p50_512io = serve_p50(upload_res=512, output_res=512)

    # ---- link bandwidth, measured IN-RUN (VERDICT r3 #4) ----
    # The serving p50 is at the mercy of day-to-day tunnel bandwidth (r03
    # shipped 545 ms vs r02's 290 purely on link drift); these two numbers
    # let any reader normalize a serving figure across rounds.
    import numpy as _np

    def _link_bw():
        probe_mb = 8
        host_buf = _np.random.RandomState(1).rand(
            probe_mb * 1024 * 1024 // 4).astype(_np.float32)
        ups, downs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            dev = jax.device_put(host_buf)
            float(jnp.sum(dev[::65537]))  # force + sync
            ups.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _np.asarray(dev)
            downs.append(time.perf_counter() - t0)
        med = lambda xs: sorted(xs)[len(xs) // 2]
        return (round(probe_mb / med(ups), 1), round(probe_mb / med(downs), 1))

    link_up, link_down = _link_bw()

    # ---- serving-latency budget: which bytes cost what (VERDICT r2 #6) ----
    # Decomposes the serving lap into host coercion, upload, device
    # compute (incl. one tunnel RTT for the scalar probe), and download.
    from hairfastgan_tpu.utils.images import to_image_u8

    def serving_budget(up, ores):
        fn_u8 = hf._fn("distinct", u8=True, out_res=ores)
        key = jax.random.PRNGKey(0)
        co, upl, dev, dwn, rtt = [], [], [], [], []
        dev_scalar = jax.device_put(jnp.float32(0.0))
        for i in range(5):
            ims = [np_.clip(rng.rand(size, size, 3) * 255, 0, 255)
                   .astype("uint8") for _ in range(3)]
            t0 = time.perf_counter()
            coerced = [to_image_u8(im, up) for im in ims]
            t1 = time.perf_counter()
            on_dev = [jax.device_put(jnp.asarray(im)[None]) for im in coerced]
            float(jnp.sum(on_dev[0][:, 0, 0, 0]))  # force + sync transfer
            t2 = time.perf_counter()
            out, probe = fn_u8(hf.zoo, *on_dev, key)
            float(probe)  # device compute + one RTT
            t3 = time.perf_counter()
            host = np_.asarray(out)
            t4 = time.perf_counter()
            float(dev_scalar + i)  # empty round-trip = pure tunnel RTT
            t5 = time.perf_counter()
            co.append(t1 - t0); upl.append(t2 - t1); dev.append(t3 - t2)
            dwn.append(t4 - t3); rtt.append(t5 - t4)
        med = lambda xs: round(sorted(xs)[len(xs) // 2] * 1e3, 2)
        return {
            "coerce_ms": med(co), "upload_ms": med(upl),
            "upload_bytes": int(3 * up * up * 3),
            "device_plus_rtt_ms": med(dev), "download_ms": med(dwn),
            "download_bytes": int(host.nbytes), "rtt_ms": med(rtt),
        }

    budget_full = serving_budget(size, size)
    budget_512io = serving_budget(512, 512)

    # Bandwidth-normalized serving latency: rebuild the lap from its parts
    # with the BYTE terms priced at a fixed reference bandwidth
    # (REF_BW_MBPS, the r02-era effective tunnel rate) instead of today's
    # link — the cross-round comparable serving number. The raw p50s above
    # stay as the what-a-caller-saw-today truth.
    REF_BW_MBPS = 40.0

    def at_ref_bw(budget):
        mb_up = budget["upload_bytes"] / 1e6
        mb_down = budget["download_bytes"] / 1e6
        return round(budget["coerce_ms"] + budget["device_plus_rtt_ms"]
                     + 1e3 * (mb_up + mb_down) / REF_BW_MBPS, 1)

    print(json.dumps({
        "metric": "hairfast_swap_1024_p50_ms",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(1000.0 / p50, 3),
        # min is the variance-robust signal through the tunnel (day-to-day
        # RTT/bandwidth drift moves p50 by ~±8 ms; device time is ~65 ms)
        "host_min_ms": round(tmin, 3),
        **throughput,
        "stage_p50_ms": {k: round(v, 2) for k, v in stage.items()},
        "serving_p50_uint8_ms": round(serving_p50, 3),
        "serving_p50_uint8_512up_ms": round(serving_p50_512, 3),
        "serving_p50_uint8_512io_ms": round(serving_p50_512io, 3),
        "serving_budget_full": budget_full,
        "serving_budget_512io": budget_512io,
        # measured link rate this run + bandwidth-normalized serving
        # latencies (byte terms priced at REF_BW_MBPS): compare THESE
        # across rounds, not the raw p50s above
        "link_up_MBps": link_up,
        "link_down_MBps": link_down,
        "serving_at_ref_bw_full_ms": at_ref_bw(budget_full),
        "serving_at_ref_bw_512io_ms": at_ref_bw(budget_512io),
        "mfu_pct": mfu,
    }))


if __name__ == "__main__":
    main()
