"""Rotate (pose) encoder training CLI — scripts/rotate_train.py port.

Alternates pose-pair batches (keypoint MSE + ArcFace id) with same-person
hair-pair batches (latent MSE), EMA-balanced like the reference's
MovingAverageLoss. The keypoint extractor is pluggable; the reference's
STAR model is broken-as-shipped (undefined utility.landmarks_arg), so by
default a frozen-keypoint dataset column is expected in the rows
(precomputed with any landmark tool).

Data rows (.npz): pose: I_from [1,256,256,3] [0,1], kp_to [1,76,2],
W_from/W_to [1,18,512]; hair: W_from/W_to only.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def batches(rows, keys, batch_size, seed=0):
    idx = np.arange(len(rows))
    np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        chunk = [np.load(rows[j]) for j in idx[i:i + batch_size]]
        yield tuple(jnp.asarray(np.concatenate([c[k] for c in chunk]))
                    for k in keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pose_dir", type=Path, required=True)
    ap.add_argument("--hair_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("checkpoints/rotate"))
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--log", type=Path, default=Path("rotate_train.jsonl"))
    args = ap.parse_args()

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.params.checkpoint import save_train_state
    from hairfastgan_tpu.parallel import make_mesh, replicate, shard_batch
    from hairfastgan_tpu.train.common import MetricLogger, MovingAverageLoss, check_finite_loss
    from hairfastgan_tpu.train.rotate import make_rotate_train_steps
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    cfg = HairFastConfig()
    key = jax.random.PRNGKey(0)
    zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
           else init_zoo(key, cfg))
    frozen = {"generator": zoo["generator"], "arcface": init_irse_backbone(key)}
    params = zoo["rotate"]

    # STAR landmark extractor (models/star.py) when its checkpoint is
    # available; otherwise a zero extractor (trains on latent + id losses;
    # the reference's own rotate training is broken without STAR weights).
    star_ckpt = args.zoo_dir / "star_wflw.pth"
    if star_ckpt.exists():
        from hairfastgan_tpu.models import star
        from hairfastgan_tpu.params.convert import load_torch_state_dict

        star_p = jax.device_put(
            star.convert_star(load_torch_state_dict(str(star_ckpt), key="net")))
        keypoint_fn = lambda img: star.keypoints_256(star_p, img)
    else:
        keypoint_fn = lambda img: jnp.zeros((img.shape[0], 76, 2), img.dtype)

    plan = make_mesh()
    frozen = replicate(plan, frozen)
    params = replicate(plan, params)
    pose_step, hair_step, tx = make_rotate_train_steps(frozen, keypoint_fn,
                                                       cfg, lr=args.lr)
    opt_state = replicate(plan, tx.init(params))

    pose_rows = sorted(args.pose_dir.glob("*.npz"))
    hair_rows = sorted(args.hair_dir.glob("*.npz"))
    logger = MetricLogger(str(args.log))
    mal = MovingAverageLoss({"mse_points": 6.0, "mse_latents": 2.0})

    with plan.mesh:
        for epoch in range(args.epochs):
            pose_it = batches(pose_rows, ("I_from", "kp_to", "W_from", "W_to"),
                              args.batch_size, seed=epoch)
            hair_it = batches(hair_rows, ("W_from", "W_to"),
                              args.batch_size, seed=epoch)
            for pose_b, hair_b in zip(pose_it, hair_it):
                params, opt_state, aux = pose_step(
                    params, opt_state, *shard_batch(plan, pose_b))
                logger.log(**{k: v for k, v in aux.items() if jnp.ndim(v) == 0})
                check_finite_loss(aux["loss"], logger.step)
                params, opt_state, aux = hair_step(
                    params, opt_state, *shard_batch(plan, hair_b))
                logger.log(**{k: v for k, v in aux.items() if jnp.ndim(v) == 0})
            save_train_state(args.ckpt_dir / "last", params, opt_state, logger.step)
            print(f"epoch {epoch} done")


if __name__ == "__main__":
    main()
