"""Rotate-dataset generation — scripts/rotate_gen.py port.

The reference precomputes, per FFHQ image, the 256 target, its e4e W+ code
and its STAR keypoints into one pickle (rotate_gen.py:27-53), then pairs
rows randomly at train time (two shuffled iterators, rotate_train.py:198-201).
Our trainer consumes pre-paired .npz rows (scripts/train_rotate.py), so this
generator does the pairing up front:

  pose rows  (pose_dir):  I_from [1,256,256,3] in [0,1], kp_to [1,76,2]
                          (STAR landmarks of the TARGET image), W_from, W_to
  hair rows  (hair_dir):  W_from = cat(W_to_pose[:6], W_src[6:]), W_to =
                          W_src — the data-level analog of the reference's
                          cycle pairs (calc_hair_loss receives gen_latent,
                          whose rows 6: are the source's and rows :6 carry
                          the target's pose, rotate_train.py:205-216);
                          rotating W_from back toward W_src must recover
                          W_src[:6].

Keypoints need the STAR checkpoint (star_wflw.pth in --zoo_dir); without it
pass --no_keypoints explicitly to emit zero keypoints (train_rotate then
must also run with --no_keypoints).
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", type=Path, required=True)
    ap.add_argument("--n_pairs", type=int, default=10_000)
    ap.add_argument("--pose_dir", type=Path, required=True)
    ap.add_argument("--hair_dir", type=Path, required=True)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--seed", type=int, default=3407)
    ap.add_argument("--no_keypoints", action="store_true",
                    help="emit zero keypoints (no STAR checkpoint); the "
                         "trainer must then also run with --no_keypoints")
    ap.add_argument("--tiny", action="store_true",
                    help="128-res random-weight config (CI smoke runs)")
    ap.add_argument("--micro", action="store_true",
                    help="--tiny with 0.25x trunk widths (cheapest CI "
                         "smoke; W rows stay [n_latent, 512] — style dim "
                         "is width-independent)")
    args = ap.parse_args(argv)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.train.datagen import generate_rotate_pair
    from hairfastgan_tpu.utils.images import to_image_array
    from hairfastgan_tpu.zoo import (init_micro_zoo_fast, init_tiny_zoo,
                                     init_zoo, load_zoo)

    if args.micro:
        zoo, cfg = init_micro_zoo_fast(0)
    elif args.tiny:
        zoo, cfg = init_tiny_zoo(jax.random.PRNGKey(0))
    else:
        cfg = HairFastConfig()
        zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
               else init_zoo(jax.random.PRNGKey(0), cfg))
    zoo = jax.device_put(zoo)

    star_ckpt = args.zoo_dir / "star_wflw.pth"
    if star_ckpt.exists():
        from hairfastgan_tpu.models import star
        from hairfastgan_tpu.params.convert import load_torch_state_dict

        star_p = jax.device_put(
            star.convert_star(load_torch_state_dict(str(star_ckpt), key="net")))
        keypoint_fn = lambda img: star.keypoints_256(star_p, img)
    elif args.no_keypoints:
        print("WARNING: --no_keypoints — pose rows carry ZERO keypoints")
        keypoint_fn = lambda img: jnp.zeros((img.shape[0], 76, 2), img.dtype)
    else:
        raise SystemExit(
            f"STAR checkpoint not found: {star_ckpt}\n"
            "Rotate data needs the landmark extractor for kp_to. Either "
            "place star_wflw.pth in --zoo_dir, or pass --no_keypoints.")

    files = sorted(p for p in args.input_dir.iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    if len(files) < 2:
        raise SystemExit(f"need >=2 images in {args.input_dir}")
    rng = random.Random(args.seed)
    pairs = [tuple(rng.sample(files, 2)) for _ in range(args.n_pairs)]

    def gen(z, img_a, img_b):
        row = generate_rotate_pair(z, img_a, img_b, cfg)
        row["kp_to"] = keypoint_fn(row.pop("I_to"))
        return row

    gen = jax.jit(gen)
    args.pose_dir.mkdir(parents=True, exist_ok=True)
    args.hair_dir.mkdir(parents=True, exist_ok=True)
    for i, (a, b) in enumerate(pairs):
        imgs = [to_image_array(p, cfg.stylegan.size)[None] for p in (a, b)]
        row = {k: np.asarray(v, np.float32)
               for k, v in gen(zoo, *imgs).items()}
        np.savez(args.pose_dir / f"row_{i:06d}.npz",
                 I_from=row["I_from"], kp_to=row["kp_to"],
                 W_from=row["W_from"], W_to=row["W_to"])
        # cycle hair pair: pose rows of the target grafted onto the source
        w_mix = np.concatenate([row["W_to"][:, :6], row["W_from"][:, 6:]],
                               axis=1)
        np.savez(args.hair_dir / f"row_{i:06d}.npz",
                 W_from=w_mix, W_to=row["W_from"])
        if i % 50 == 0:
            print(f"{i}/{len(pairs)}")


if __name__ == "__main__":
    main()
