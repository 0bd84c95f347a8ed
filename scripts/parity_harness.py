"""Per-stage numerical parity harness vs the PyTorch reference.

Run the snippet below on a machine with the reference repo + checkpoints to
dump golden activations, then run this script here to compare every pipeline
stage (the per-stage golden-tensor strategy of SURVEY.md §4).

Reference-side dump (PyTorch, one triple):

    # in the reference repo root
    import numpy as np, torch
    from hair_swap import HairFast, get_parser
    hf = HairFast(get_parser().parse_args([]))
    face = shape = color = <1024x1024 uint8 tensors>
    emb = hf.embed.embedding_images({face: ['face'], shape: ['shape'],
                                     color: ['color']})
    np.savez('golden.npz',
             face=face.numpy(), shape=shape.numpy(), color=color.numpy(),
             W=emb['face']['W'].cpu().numpy(),
             S=emb['face']['S'].cpu().numpy(),
             F=emb['face']['F'].cpu().numpy(),
             mask=emb['face']['mask'].cpu().numpy())

Then:  python scripts/parity_harness.py --golden golden.npz \
           --zoo_dir pretrained_models_jax
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--golden", type=Path, required=True)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--tol", type=float, default=0.02,
                    help="mean relative error budget per stage (bf16-free "
                         "f32 comparison)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.pipeline.embedding import embed_images
    from hairfastgan_tpu.zoo import load_zoo

    g = np.load(args.golden)
    cfg = HairFastConfig()
    zoo = jax.device_put(load_zoo(args.zoo_dir, cfg))

    face = jnp.asarray(g["face"], jnp.float32)
    if face.ndim == 3 and face.shape[0] == 3:  # torch CHW -> NHWC
        face = jnp.transpose(face, (1, 2, 0))
    if face.dtype != jnp.float32 or float(face.max()) > 1.5:
        face = face.astype(jnp.float32) / 255.0

    emb = embed_images(zoo, face[None], mix=False, cfg=cfg)

    checks = {
        "W": (emb["W"][0], g["W"].squeeze()),
        "S": (emb["S"][0], g["S"].squeeze()),
        # torch F is NCHW [512,32,32]
        "F": (jnp.transpose(emb["F"][0], (2, 0, 1)), g["F"].squeeze()),
    }
    failures = []
    for name, (ours, ref) in checks.items():
        e = rel_err(ours, ref)
        status = "OK " if e <= args.tol else "FAIL"
        print(f"[{status}] {name}: mean rel err {e:.5f}")
        if e > args.tol:
            failures.append(name)

    if "mask" in g:
        ours = np.asarray(emb["mask"][0])
        ref = g["mask"].squeeze()
        agree = float((ours == ref).mean())
        print(f"[{'OK ' if agree > 0.98 else 'FAIL'}] mask: label agreement {agree:.4f}")
        if agree <= 0.98:
            failures.append("mask")

    if failures:
        raise SystemExit(f"parity failures: {failures}")
    print("all stages within tolerance")


if __name__ == "__main__":
    main()
