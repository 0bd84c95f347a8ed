"""Full-width (1024² renders) PP training programs on the real TPU.

Round-3 validated PP training at the TINY config only (128-res generator,
1.15 s/step). This probe runs the REAL-width programs the reference trains
with (scripts/pp_train.py:121-183,345 — 1024² G renders at batch 8,
adversarial discriminator + lazy R1) and records, per program:
  compile_s   TPU compile wall time through the tunnel
  hlo_mb      unoptimized-HLO proto size (the remote_compile upload;
              the HTTP-413 guard — must stay MBs with frozen-as-argument)
  step_s      per-step wall times (scalar-fetch synced; first entry after
              compile is steady-state, inputs varied per step)
  memory      XLA memory analysis of the compiled executable (argument /
              output / temp bytes — temp is the activation HBM the remat
              flag exists to shrink)
Results land in TRAIN_r04.json at the repo root (the committed artifact).

B descends 8 -> 4 -> 2 -> 1 on OOM/compile failure per program family, so
the artifact reports the max batch that fits instead of dying.

Usage (TPU host; expect ~1 h cold, the persistent cache covers reruns):
    python tools/train_full_probe.py [--programs fused,fused_remat,split,disc,r1]
    python tools/train_full_probe.py --batches 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path(__file__).resolve().parent.parent / "TRAIN_r04.json"


def _enable_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/hairfast_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def memory_analysis(compiled):
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            return {}
        out = {}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k.replace("_size_in_bytes", "_gb")] = round(v / 2 ** 30, 3)
        return out
    except Exception as e:
        return {"error": repr(e)[:150]}


def hlo_mb(lowered):
    try:
        hlo = lowered.compiler_ir(dialect="hlo")
        return round(len(hlo.as_serialized_hlo_module_proto()) / 2 ** 20, 2)
    except Exception:
        return None


def probe(fn, args, sync, n_steps=3, vary=None):
    """lower -> compile -> n timed steps. Returns a result row; never raises
    (OOM / 413 / compile errors land in the row)."""
    row = {}
    t0 = time.time()
    try:
        lowered = fn.lower(*args) if hasattr(fn, "lower") else jax.jit(fn).lower(*args)
    except Exception as e:
        return {"lower_error": repr(e)[:300]}
    row["lower_s"] = round(time.time() - t0, 1)
    row["hlo_mb"] = hlo_mb(lowered)
    t0 = time.time()
    try:
        compiled = lowered.compile()
    except Exception as e:
        row["compile_error"] = repr(e)[:300]
        return row
    row["compile_s"] = round(time.time() - t0, 1)
    row["memory"] = memory_analysis(compiled)
    steps = []
    try:
        for i in range(n_steps):
            a = vary(args, i) if vary else args
            t0 = time.time()
            out = compiled(*a)
            sync(out)
            steps.append(round(time.time() - t0, 2))
    except Exception as e:
        row["run_error"] = repr(e)[:300]
    row["step_s"] = steps
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs",
                    default="fused,fused_remat,split,disc,r1",
                    help="comma list of fused,fused_remat,split,split_remat,"
                         "disc,r1")
    ap.add_argument("--batches", default="8,4,2,1",
                    help="descending batch ladder; stops at first success "
                         "per program")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    _enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.losses.perceptual import init_lpips_alex
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.models.stylegan2_discriminator import (
        init_discriminator)
    from hairfastgan_tpu.train.pp import (
        make_pp_split_train_step, make_pp_train_steps)
    from hairfastgan_tpu.zoo import _fill_random, init_zoo

    cfg = HairFastConfig()  # REAL width: 1024² renders
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda: dict(
        zoo=init_zoo(key, cfg),
        bisenet16=bisenet.init_bisenet(key, n_classes=16),
        id_backbone=init_irse_backbone(key),
        lpips=init_lpips_alex(key),
        disc=init_discriminator(key, cfg.stylegan)))
    filled = _fill_random(shapes, 0)
    # device-resident ONCE: numpy args would re-ship the ~2 GB frozen tree
    # through the tunnel on every compiled call
    frozen = jax.device_put({"generator": filled["zoo"]["generator"],
                             "bisenet16": filled["bisenet16"],
                             "id_backbone": filled["id_backbone"],
                             "lpips": filled["lpips"]})
    params = jax.device_put(filled["zoo"]["post_process"])
    disc_params = jax.device_put(filled["disc"])
    size = cfg.stylegan.size

    def batch_at(b, seed=0):
        rng = np.random.RandomState(seed)
        return (jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
                jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
                jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32),
                jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32))

    alpha = jnp.float32(0.7)
    results = {"config": {"size": size, "dtype": "float32",
                          "device": str(jax.devices()[0])}}
    want = [p.strip() for p in args.programs.split(",")]
    ladder = [int(b) for b in args.batches.split(",")]

    def sync_enc(out):
        # out = (params, opt_state, aux)
        float(np.asarray(out[2]["loss"]))

    def run_ladder(name, build):
        """build(b) -> (fn, args, sync, vary). Descends the batch ladder."""
        for b in ladder:
            print(f"[{name}] B={b} ...", flush=True)
            fn, a, sync, vary = build(b)
            row = probe(fn, a, sync, n_steps=args.steps, vary=vary)
            row["batch"] = b
            ok = row.get("step_s") and "run_error" not in row
            results[name] = row
            print(f"[{name}] B={b}: {row}", flush=True)
            if ok:
                break

    if "fused" in want or "fused_remat" in want:
        for name, remat in (("fused", False), ("fused_remat", True)):
            if name not in want:
                continue

            def build(b, remat=remat):
                fused, _, _, tx, _ = make_pp_train_steps(frozen, cfg=cfg,
                                                         remat=remat)
                opt_state = tx.init(params)
                a = (params, opt_state, frozen) + batch_at(b) + (alpha,)

                def vary(base, i):
                    return base[:3] + batch_at(b, seed=i) + (alpha,)

                return fused.jitted, a, sync_enc, vary

            run_ladder(name, build)

    if "split" in want or "split_remat" in want:
        for name, remat in (("split", False), ("split_remat", True)):
            if name not in want:
                continue
            for b in ladder:
                split, stx = make_pp_split_train_step(frozen, cfg=cfg,
                                                      remat=remat)
                seg_args = (params, frozen) + batch_at(b) + (alpha,)
                fam = {}
                ok = True
                for seg_name, seg in split.segments.items():
                    if seg_name == "seg_adv":
                        continue
                    vary = None
                    if seg_name == "apply":
                        zg = jax.tree.map(jnp.zeros_like, params)
                        a = (params, stx.init(params), zg, zg, zg)
                        sync = lambda out: float(np.asarray(out[2]))
                    else:
                        a = seg_args
                        sync = lambda out: float(np.asarray(out[0][0]))
                        # distinct inputs per timed step: identical repeat
                        # executions can be served from a cache through the
                        # tunnel (CLAUDE.md)
                        vary = (lambda base, i, b=b:
                                (base[0], base[1]) + batch_at(b, seed=i)
                                + (alpha,))
                    print(f"[{name}:{seg_name}] B={b} ...", flush=True)
                    row = probe(seg, a, sync, n_steps=args.steps, vary=vary)
                    fam[seg_name] = row
                    print(f"[{name}:{seg_name}] B={b}: {row}", flush=True)
                    ok = ok and row.get("step_s") and "run_error" not in row
                fam["batch"] = b
                results[name] = fam
                if ok:
                    break

    if "disc" in want:
        def build_disc(b):
            _, disc_step, _, _, d_tx = make_pp_train_steps(frozen, cfg=cfg,
                                                           use_adv=True)
            d_opt = d_tx.init(disc_params)
            rng = np.random.RandomState(1)
            real = jnp.asarray(rng.randn(b, size, size, 3), jnp.float32) * 0.3
            fake = jnp.asarray(rng.randn(b, size, size, 3), jnp.float32) * 0.3
            a = (disc_params, d_opt, None, real, fake)

            def vary(base, i):
                r = np.random.RandomState(10 + i)
                return base[:3] + (
                    jnp.asarray(r.randn(b, size, size, 3), jnp.float32) * 0.3,
                    jnp.asarray(r.randn(b, size, size, 3), jnp.float32) * 0.3)

            return disc_step.jitted, a, sync_enc, vary

        run_ladder("disc", build_disc)

    if "r1" in want:
        def build_r1(b):
            _, _, r1_step, _, _ = make_pp_train_steps(frozen, cfg=cfg,
                                                      use_adv=True)
            rng = np.random.RandomState(2)
            real = jnp.asarray(rng.randn(b, size, size, 3), jnp.float32) * 0.3
            a = (disc_params, real)

            def vary(base, i):
                r = np.random.RandomState(20 + i)
                return (base[0],
                        jnp.asarray(r.randn(b, size, size, 3),
                                    jnp.float32) * 0.3)

            def sync(out):
                float(np.asarray(out))

            return r1_step, a, sync, vary

        run_ladder("r1", build_r1)

    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
