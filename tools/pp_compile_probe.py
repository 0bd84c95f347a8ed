"""Probe: can the PP training step compile on the real TPU via its link?

The fused enc_step's unoptimized-HLO upload is rejected by the axon
tunnel's body limit (remote_compile: HTTP 413) even at tiny config — so PP
training had only ever executed on the CPU backend. `--split_compile`
(hairfastgan_tpu/train/pp.make_pp_split_train_step) re-expresses the same
update as 3-4 smaller programs. This tool measures each program's
unoptimized-HLO size and then actually attempts the TPU compile+run of
each, so CLAUDE.md can record measured numbers instead of guesses.

Usage (on the TPU host; ~minutes per compile):
    python tools/pp_compile_probe.py [--full] [--sizes-only] [--use_adv]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def lowered_sizes(lowered) -> dict:
    """Byte sizes of the artifacts a remote-compile link might ship."""
    out = {}
    try:
        out["stablehlo_text"] = len(str(lowered.compiler_ir()).encode())
    except Exception:
        pass
    try:
        hlo = lowered.compiler_ir(dialect="hlo")
        out["hlo_proto"] = len(hlo.as_serialized_hlo_module_proto())
    except Exception:
        pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="1024-res full config (default: tiny 128-res)")
    ap.add_argument("--sizes-only", action="store_true",
                    help="measure lowering sizes, skip device compiles")
    ap.add_argument("--use_adv", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from hairfastgan_tpu.config import HairFastConfig, StyleGANConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.losses.perceptual import init_lpips_alex
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.train.pp import (
        make_pp_split_train_step, make_pp_train_steps)
    from hairfastgan_tpu.zoo import _fill_random, init_tiny_zoo, init_zoo

    key = jax.random.PRNGKey(0)
    # numpy-filled shapes: jax.random leaf-by-leaf init dispatches thousands
    # of tiny ops through the TPU tunnel (minutes); shapes are all we need
    if args.full:
        cfg = HairFastConfig()
        zoo_fn = lambda: init_zoo(jax.random.PRNGKey(0), cfg)
    else:
        cfg = HairFastConfig(stylegan=StyleGANConfig(size=128))
        zoo_fn = lambda: init_tiny_zoo(jax.random.PRNGKey(0))[0]
    shapes = jax.eval_shape(lambda: dict(
        zoo=zoo_fn(),
        bisenet16=bisenet.init_bisenet(key, n_classes=16),
        id_backbone=init_irse_backbone(key),
        lpips=init_lpips_alex(key)))
    filled = _fill_random(shapes, 0)
    frozen = {"generator": filled["zoo"]["generator"],
              "bisenet16": filled["bisenet16"],
              "id_backbone": filled["id_backbone"],
              "lpips": filled["lpips"]}
    params = filled["zoo"]["post_process"]

    b = args.batch
    rng = np.random.RandomState(0)
    batch = (jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
             jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
             jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32),
             jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32))
    alpha = jnp.float32(0.7)

    fused, _, _, tx, _ = make_pp_train_steps(frozen, cfg=cfg,
                                             use_adv=args.use_adv)
    split, stx = make_pp_split_train_step(frozen, cfg=cfg,
                                          use_adv=args.use_adv)
    opt_state = tx.init(params)

    # the adversarial variants consume discriminator params BEFORE alpha
    # (make_pp_train_steps' loss_fn unpacks `*batch, disc_params, alpha`)
    disc_tail = ()
    if args.use_adv:
        from hairfastgan_tpu.models.stylegan2_discriminator import (
            init_discriminator)

        disc_tail = (_fill_random(
            jax.eval_shape(lambda: init_discriminator(key, cfg.stylegan)),
            1),)

    # lower the INNER jitted step with frozen as an explicit argument —
    # the public wrappers bind frozen at call time for exactly this reason
    programs = {"fused_enc_step": (
        fused.jitted, (params, opt_state, frozen) + batch + disc_tail + (alpha,))}

    seg_args = (params, frozen) + batch + (alpha,)
    for n, fn in split.segments.items():
        if n == "seg_adv":
            if not args.use_adv:
                continue  # needs disc params
            programs[n] = (fn, seg_args + disc_tail)
            continue
        if n == "apply":
            zero_g = jax.tree.map(jnp.zeros_like, params)
            programs[n] = (fn, (params, opt_state, zero_g, zero_g, zero_g))
        else:
            programs[n] = (fn, seg_args)

    results = {}
    for name, (fn, a) in programs.items():
        t0 = time.time()
        try:
            lowered = fn.lower(*a) if hasattr(fn, "lower") else jax.jit(fn).lower(*a)
        except Exception as e:
            results[name] = {"lower_error": repr(e)[:200]}
            continue
        sizes = lowered_sizes(lowered)
        row = dict(sizes, lower_s=round(time.time() - t0, 1))
        if not args.sizes_only:
            t1 = time.time()
            try:
                compiled = lowered.compile()
                row["compile_s"] = round(time.time() - t1, 1)
                row["compile_ok"] = True
                del compiled
            except Exception as e:
                row["compile_ok"] = False
                row["compile_error"] = repr(e)[:300]
        results[name] = row
        print(f"{name}: {row}", flush=True)

    print("\nsummary:")
    for name, row in results.items():
        print(f"  {name}: {row}")


if __name__ == "__main__":
    main()
