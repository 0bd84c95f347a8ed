"""Blending-dataset generation — scripts/blending_gen.py port.

Runs the inference pipeline up to (but not including) the blending encoder
on random FFHQ-style triples and dumps one .npz row per triple (the
reference monkey-patches blend_images to identity, blending_gen.py:16-51;
here the cut is the explicit `generate_blending_sample`).

Input: --file_path with lines "face shape color" (paths relative to
--input_dir), or --n_random random triples drawn from --input_dir.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", type=Path, required=True)
    ap.add_argument("--file_path", type=Path, default=None)
    ap.add_argument("--n_random", type=int, default=0)
    ap.add_argument("--out_dir", type=Path, required=True)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--seed", type=int, default=3407)
    args = ap.parse_args(argv)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.train.datagen import generate_blending_sample
    from hairfastgan_tpu.utils.images import to_image_array
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    cfg = HairFastConfig()
    zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
           else init_zoo(jax.random.PRNGKey(0), cfg))
    zoo = jax.device_put(zoo)

    triples = []
    if args.file_path:
        for line in open(args.file_path):
            if line.strip():
                triples.append(tuple(line.split()))
    else:
        files = sorted(p.name for p in args.input_dir.iterdir()
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        rng = random.Random(args.seed)
        for _ in range(args.n_random):
            triples.append(tuple(rng.sample(files, 3)))

    gen = jax.jit(lambda z, f, s, c: generate_blending_sample(z, f, s, c, cfg))
    args.out_dir.mkdir(parents=True, exist_ok=True)
    for i, (f, s, c) in enumerate(triples):
        imgs = [to_image_array(args.input_dir / p, cfg.stylegan.size)[None]
                for p in (f, s, c)]
        row = gen(zoo, *imgs)
        np.savez(args.out_dir / f"row_{i:06d}.npz",
                 **{k: np.asarray(v, np.float32) for k, v in row.items()})
        if i % 50 == 0:
            print(f"{i}/{len(triples)}")


if __name__ == "__main__":
    main()
