"""Full-width (1024² renders) PP training programs on the real TPU.

Round-3 validated PP training at the TINY config only (128-res generator,
1.15 s/step). This probe runs the REAL-width programs the reference trains
with (scripts/pp_train.py:121-183,345 — 1024² G renders at batch 8,
adversarial discriminator + lazy R1) and records, per program:
  compile_s   TPU compile wall time through the tunnel
  hlo_mb      unoptimized-HLO proto size (the remote_compile upload;
              the HTTP-413 guard — must stay MBs with frozen-as-argument)
  step_s      per-step wall times (scalar-fetch synced; batches are
              pre-staged on device and varied per step so neither tunnel
              upload nor the repeat-execution cache pollutes the numbers)
  memory      XLA memory analysis of the compiled executable (argument /
              output / temp bytes — temp is the activation HBM the remat
              flag exists to shrink; see train/pp._make_synth)
Results land in TRAIN_r05.json at the repo root (the committed artifact;
seeded from TRAIN_r04.json's rows on first run).

Isolation: every (program, batch) rung runs in its OWN subprocess
(`--one name:b`). A single process accumulates device state across rungs —
measured: after the fused B=2 executable OOM'd, even optimizer INIT at B=1
hit RESOURCE_EXHAUSTED, poisoning the rest of the ladder. The orchestrator
(default mode) descends the batch ladder per program, merges each rung's
RESULT line into TRAIN_r05.json immediately (a killed run still leaves the
artifact), and stops the ladder at the first batch that steps successfully.

Usage (TPU host; expect ~1 h cold, the persistent cache covers reruns):
    python tools/train_full_probe.py [--programs fused,fused_remat,...]
    python tools/train_full_probe.py --one fused_remat:4
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_ROOT = Path(__file__).resolve().parent.parent
OUT = _ROOT / "TRAIN_r05.json"
_PREV = _ROOT / "TRAIN_r04.json"  # seed for resume: round-4 rows carry over
ALL_PROGRAMS = ("fused", "fused_remat", "fused_bf16", "split", "split_remat",
                "split_bf16", "disc", "r1")


# --------------------------------------------------------------------------
# single-rung worker (--one name:b)
# --------------------------------------------------------------------------

def _enable_compile_cache():
    import jax
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


def probe(fn, args, run_steps):
    """lower -> compile -> run_steps(compiled). Returns a result row; never
    raises (OOM / 413 / compile errors land in the row)."""
    import jax

    row = {}
    t0 = time.time()
    try:
        lowered = fn.lower(*args) if hasattr(fn, "lower") \
            else jax.jit(fn).lower(*args)
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
    try:
        row["step_s"] = run_steps(compiled)
    except Exception as e:
        row["run_error"] = repr(e)[:300]
    return row


def run_one(name: str, b: int, n_steps: int, size: int = 1024):
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    from hairfastgan_tpu.config import HairFastConfig, StyleGANConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.losses.perceptual import init_lpips_alex
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.models.stylegan2_discriminator import (
        init_discriminator)
    from hairfastgan_tpu.train.pp import (
        make_pp_split_train_step, make_pp_train_steps)
    from hairfastgan_tpu.zoo import _fill_random, init_zoo

    # default = REAL width, 1024² renders; --size shrinks the generator for
    # cheap plumbing smoke tests of the probe itself
    cfg = HairFastConfig(stylegan=StyleGANConfig(size=size))
    key = jax.random.PRNGKey(0)
    remat = name.endswith("_remat")
    disc_like = name in ("disc", "r1")

    shape_tree = dict(disc=init_discriminator(key, cfg.stylegan)) if disc_like \
        else dict(zoo=init_zoo(key, cfg),
                  bisenet16=bisenet.init_bisenet(key, n_classes=16),
                  id_backbone=init_irse_backbone(key),
                  lpips=init_lpips_alex(key))
    shapes = jax.eval_shape(lambda: shape_tree)
    filled = _fill_random(shapes, 0)
    size = cfg.stylegan.size
    alpha = jnp.float32(0.7)

    def _stage(tree):
        """device_put + force (axon's block_until_ready is a no-op)."""
        tree = jax.device_put(tree)
        np.asarray(jax.tree.leaves(tree)[0]).ravel()[:1]
        return tree

    def staged_batches(maker):
        return [_stage(maker(i)) for i in range(n_steps)]

    if disc_like:
        disc_params = _stage(filled["disc"])

        def img_pair(i):
            r = np.random.RandomState(100 + i)
            return (jnp.asarray(r.randn(b, size, size, 3), jnp.float32) * 0.3,
                    jnp.asarray(r.randn(b, size, size, 3), jnp.float32) * 0.3)

        batches = staged_batches(img_pair)
        if name == "disc":
            _, disc_step, _, _, d_tx = make_pp_train_steps(
                {}, cfg=cfg, use_adv=True, donate=True)
            d_opt = _stage(d_tx.init(disc_params))

            def run_steps(compiled):
                dp, do = disc_params, d_opt
                times = []
                for real, fake in batches:
                    t0 = time.time()
                    dp, do, aux = compiled(dp, do, None, real, fake)
                    float(np.asarray(aux["loss"]))
                    times.append(round(time.time() - t0, 2))
                return times

            row = probe(disc_step.jitted,
                        (disc_params, d_opt, None) + batches[0], run_steps)
        else:  # r1
            _, _, r1_step, _, _ = make_pp_train_steps({}, cfg=cfg,
                                                      use_adv=True)

            def run_steps(compiled):
                times = []
                for real, _ in batches:
                    t0 = time.time()
                    out = compiled(disc_params, real)
                    float(np.asarray(out))
                    times.append(round(time.time() - t0, 2))
                return times

            row = probe(r1_step, (disc_params, batches[0][0]), run_steps)
    else:
        # fused_bf16: mixed precision — frozen nets resident in bf16
        # (halves the ~2.5 GB argument term), activations bf16 via
        # pp_loss(compute_dtype=), Adam master params/opt state f32
        dt = jnp.bfloat16 if name.endswith("_bf16") else None
        frozen_tree = {"generator": filled["zoo"]["generator"],
                       "bisenet16": filled["bisenet16"],
                       "id_backbone": filled["id_backbone"],
                       "lpips": filled["lpips"]}
        if dt is not None:
            from hairfastgan_tpu.zoo import cast_zoo
            frozen_tree = cast_zoo(frozen_tree, dt)
        # device-resident ONCE: numpy args would re-ship the ~2 GB frozen
        # tree through the tunnel on every compiled call
        frozen = _stage(frozen_tree)
        params = _stage(filled["zoo"]["post_process"])

        def batch_at(i):
            rng = np.random.RandomState(i)
            return (jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
                    jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
                    jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32),
                    jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32))

        batches = staged_batches(batch_at)

        if name.startswith("fused"):
            fused, _, _, tx, _ = make_pp_train_steps(frozen, cfg=cfg,
                                                     remat=remat, donate=True,
                                                     compute_dtype=dt)
            opt_state = _stage(tx.init(params))

            def run_steps(compiled):
                p, o = params, opt_state
                times = []
                for bt in batches:
                    t0 = time.time()
                    p, o, aux = compiled(p, o, frozen, *bt, alpha)
                    float(np.asarray(aux["loss"]))
                    times.append(round(time.time() - t0, 2))
                return times

            row = probe(fused.jitted,
                        (params, opt_state, frozen) + batches[0] + (alpha,),
                        run_steps)
        else:  # split / split_remat / split_bf16: one row per segment
            split, stx = make_pp_split_train_step(frozen, cfg=cfg,
                                                  remat=remat,
                                                  compute_dtype=dt)
            row = {}
            for seg_name, seg in split.segments.items():
                if seg_name == "seg_adv":
                    continue
                if seg_name == "apply":
                    # apply consumes only (params, opt, grads) — release the
                    # ~2.4 GB frozen tree + staged batches first; with them
                    # resident the B=1 apply rung OOM'd (fragmentation after
                    # three big segment executions, round-4 log)
                    for leaf in jax.tree.leaves((frozen, batches)):
                        leaf.delete()
                    zg = jax.tree.map(jnp.zeros_like, params)
                    opt0 = stx.init(params)

                    def run_steps(compiled):
                        times = []
                        for _ in range(n_steps):
                            t0 = time.time()
                            out = compiled(params, opt0, zg, zg, zg)
                            float(np.asarray(out[2]))
                            times.append(round(time.time() - t0, 2))
                        return times

                    a = (params, opt0, zg, zg, zg)
                else:
                    def run_steps(compiled):
                        times = []
                        for bt in batches:
                            t0 = time.time()
                            out = compiled(params, frozen, *bt, alpha)
                            float(np.asarray(out[0][0]))
                            times.append(round(time.time() - t0, 2))
                        return times

                    a = (params, frozen) + batches[0] + (alpha,)
                print(f"[{name}:{seg_name}] B={b} ...", flush=True)
                seg_row = probe(seg, a, run_steps)
                print(f"[{name}:{seg_name}] B={b}: {seg_row}", flush=True)
                row[seg_name] = seg_row

    row["batch"] = b
    # dtype is knowable from the program name — record it per row (a global
    # config string claimed bf16 even for all-f32 artifacts; ADVICE r4)
    row["dtype"] = ("bf16 mixed precision, f32 Adam masters"
                    if name.endswith("_bf16") else "float32")
    print("RESULT " + json.dumps(row), flush=True)
    return row


def _rung_ok(row) -> bool:
    if "batch" not in row:
        return False
    segs = [v for v in row.values() if isinstance(v, dict) and (
        "step_s" in v or "compile_error" in v or "run_error" in v
        or "lower_error" in v)]
    rows = segs if segs else [row]
    return all(r.get("step_s") and "run_error" not in r for r in rows)


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", default=",".join(ALL_PROGRAMS),
                    help="comma list of " + ",".join(ALL_PROGRAMS))
    ap.add_argument("--batches", default="8,4,2,1",
                    help="descending batch ladder; stops at first success "
                         "per program")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-rung subprocess timeout (s); full-width fused "
                         "compiles took ~8 min through the tunnel, and the "
                         "TPU attach itself can stall ~10 min after a "
                         "previous process detaches")
    ap.add_argument("--size", type=int, default=1024,
                    help="generator size (default = real width; shrink for "
                         "plumbing smoke tests)")
    ap.add_argument("--one", default=None, metavar="NAME:B",
                    help="worker mode: run a single (program, batch) rung "
                         "in THIS process and print a RESULT line")
    args = ap.parse_args()

    if args.one:
        name, b = args.one.rsplit(":", 1)
        run_one(name, int(b), args.steps, size=args.size)
        return

    results = {}
    src = OUT if OUT.exists() else _PREV
    if src.exists():  # resume: keep earlier rungs, re-run requested programs
        try:
            results = json.loads(src.read_text())
        except Exception:
            results = {}
        for name, row in results.items():  # backfill dtype on seeded rows
            if isinstance(row, dict) and name != "config" \
                    and "dtype" not in row:
                row["dtype"] = ("bf16 mixed precision, f32 Adam masters"
                                if name.endswith("_bf16") else "float32")
    results["config"] = {"size": args.size,
                         "dtype": "per program row (see each row's 'dtype')",
                         "ladder": args.batches,
                         "note": "each rung = fresh subprocess; per program "
                                 "the row is the LARGEST batch that stepped, "
                                 "failed_rungs lists the batches above it"}

    def save():
        OUT.write_text(json.dumps(results, indent=1))

    for name in [p.strip() for p in args.programs.split(",")]:
        failed = []
        for b in [int(x) for x in args.batches.split(",")]:
            print(f"=== [{name}] B={b} (subprocess) ===", flush=True)
            t0 = time.time()
            for attempt in (0, 1):  # one retry: TPU attach can stall ~10 min
                try:
                    proc = subprocess.run(
                        [sys.executable, __file__, "--one", f"{name}:{b}",
                         "--steps", str(args.steps), "--size", str(args.size)],
                        capture_output=True, text=True, timeout=args.timeout)
                    out = proc.stdout + proc.stderr
                    line = next((ln for ln in proc.stdout.splitlines()[::-1]
                                 if ln.startswith("RESULT ")), None)
                    row = json.loads(line[len("RESULT "):]) if line else {
                        "proc_error": out.strip()[-400:], "batch": b,
                        "returncode": proc.returncode}
                    break
                except subprocess.TimeoutExpired:
                    row = {"timeout_s": args.timeout, "batch": b,
                           "retried": attempt == 1}
            row["rung_wall_s"] = round(time.time() - t0, 1)
            results[name] = dict(row, failed_rungs=failed)
            save()
            print(f"[{name}] B={b}: {json.dumps(row)[:600]}", flush=True)
            if _rung_ok(row):
                break
            failed.append({"batch": b, **{k: v for k, v in row.items()
                                          if "error" in str(k)
                                          or k == "timeout_s"}})

    save()
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
