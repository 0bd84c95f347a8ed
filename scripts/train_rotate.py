"""Rotate (pose) encoder training CLI — scripts/rotate_train.py port.

Alternates pose-pair batches (keypoint MSE + ArcFace id) with same-person
hair-pair batches (latent MSE), EMA-balanced exactly like the reference's
MovingAverageLoss (normalize=True in training, raw sums in validation,
rotate_train.py:155-158,233-282). Per-epoch validation on a held-out split
keeps best/last orbax checkpoints and optional render grids.

The keypoint extractor is the STAR landmark model (models/star.py) when its
checkpoint is present; without it the keypoint half of the objective is a
constant, so the script REFUSES to run unless --no_keypoints is passed
explicitly (the reference's own rotate training is broken-as-shipped
without STAR weights — SURVEY.md known defects).

Data rows (.npz): pose: I_from [1,256,256,3] [0,1], kp_to [1,76,2],
W_from/W_to [1,18,512]; hair: W_from/W_to only.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def batches(rows, keys, batch_size, seed=0, shuffle=True):
    idx = np.arange(len(rows))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        chunk = [np.load(rows[j]) for j in idx[i:i + batch_size]]
        yield tuple(jnp.asarray(np.concatenate([c[k] for c in chunk]))
                    for k in keys)


POSE_KEYS = ("I_from", "kp_to", "W_from", "W_to")
HAIR_KEYS = ("W_from", "W_to")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pose_dir", type=Path, required=True)
    ap.add_argument("--hair_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("checkpoints/rotate"))
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--test_frac", type=float, default=0.1)
    ap.add_argument("--grid_dir", type=Path, default=None,
                    help="dump [I_from | rotated render] validation grids")
    ap.add_argument("--no_keypoints", action="store_true",
                    help="train WITHOUT the keypoint loss (no STAR "
                         "checkpoint). Must be explicit: half the pose "
                         "objective becomes a constant.")
    ap.add_argument("--log", type=Path, default=Path("rotate_train.jsonl"))
    ap.add_argument("--tiny", action="store_true",
                    help="128-res random-weight config (CI smoke runs)")
    args = ap.parse_args(argv)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.params.checkpoint import save_train_state
    from hairfastgan_tpu.parallel import data_mesh_for_batch, replicate, shard_batch
    from hairfastgan_tpu.train.common import MetricLogger, MovingAverageLoss, check_finite_loss
    from hairfastgan_tpu.train.rotate import (
        make_rotate_train_steps, rotate_hair_loss, rotate_pose_loss, rotate_render)
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    key = jax.random.PRNGKey(0)
    if args.tiny:
        from hairfastgan_tpu.config import StyleGANConfig
        from hairfastgan_tpu.models import encoders, stylegan2

        cfg = HairFastConfig(stylegan=StyleGANConfig(size=128, max_channels=128))
        frozen = {"generator": stylegan2.init_generator_params(key, cfg.stylegan),
                  "arcface": init_irse_backbone(key)}
        params = encoders.init_rotate_model(key)
    else:
        cfg = HairFastConfig()
        zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
               else init_zoo(key, cfg))
        frozen = {"generator": zoo["generator"],
                  "arcface": init_irse_backbone(key)}
        params = zoo["rotate"]

    # STAR landmark extractor (models/star.py). Missing checkpoint is an
    # ERROR unless --no_keypoints: a zero extractor silently turns the
    # keypoint MSE into a parameter-independent constant.
    star_ckpt = args.zoo_dir / "star_wflw.pth"
    if star_ckpt.exists():
        from hairfastgan_tpu.models import star
        from hairfastgan_tpu.params.convert import load_torch_state_dict

        # STAR params travel inside `frozen` (a jit argument), not a
        # closure — closure arrays embed as HLO literals (train/common.py)
        frozen["star"] = jax.device_put(
            star.convert_star(load_torch_state_dict(str(star_ckpt), key="net")))
        keypoint_fn = lambda fr, img: star.keypoints_256(fr["star"], img)
    elif args.no_keypoints:
        print("WARNING: --no_keypoints — pose batches train on the ArcFace "
              "identity loss only (keypoint MSE is a constant)")
        keypoint_fn = lambda fr, img: jnp.zeros((img.shape[0], 76, 2), img.dtype)
    else:
        raise SystemExit(
            f"STAR checkpoint not found: {star_ckpt}\n"
            "Rotate training needs the landmark extractor for its keypoint "
            "loss. Either place star_wflw.pth in --zoo_dir, or pass "
            "--no_keypoints to train on the identity+latent losses only.")

    # cap the data mesh at the batch size: a global batch smaller than
    # the device count (tiny CI runs, small final batches) must not be
    # forced onto the full mesh (shard_batch needs divisibility); warns
    # when devices go idle (parallel.mesh.data_mesh_for_batch)
    plan = data_mesh_for_batch(args.batch_size)
    frozen = replicate(plan, frozen)
    params = replicate(plan, params)
    pose_step, hair_step, tx = make_rotate_train_steps(frozen, keypoint_fn,
                                                       cfg, lr=args.lr)
    opt_state = replicate(plan, tx.init(params))

    # validation = raw sums (reference validate() normalize=False)
    # validation fns take frozen as an ARGUMENT too (same HLO-literal rule)
    val_pose = jax.jit(lambda p, fr, *b: rotate_pose_loss(
        p, fr, b, keypoint_fn, cfg)[1])
    val_hair = jax.jit(lambda p, *b: rotate_hair_loss(p, b)[0])
    render = jax.jit(lambda p, fr, wf, wt: rotate_render(p, fr, wf, wt, cfg))

    pose_rows = sorted(args.pose_dir.glob("*.npz"))
    hair_rows = sorted(args.hair_dir.glob("*.npz"))
    n_vp = max(1, int(len(pose_rows) * args.test_frac))
    n_vh = max(1, int(len(hair_rows) * args.test_frac))
    val_pose_rows, pose_rows = pose_rows[:n_vp], pose_rows[n_vp:]
    val_hair_rows, hair_rows = hair_rows[:n_vh], hair_rows[n_vh:]

    logger = MetricLogger(str(args.log))
    # rotate_train.py:98 — EMA targets {'mse points to': 6, 'mse latents': 2}
    mal = MovingAverageLoss({"mse_points": 6.0, "mse_latents": 2.0})
    best = float("inf")

    with plan.mesh:
        for epoch in range(args.epochs):
            pose_it = batches(pose_rows, POSE_KEYS, args.batch_size, seed=epoch)
            hair_it = batches(hair_rows, HAIR_KEYS, args.batch_size, seed=epoch)
            for pose_b, hair_b in zip(pose_it, hair_it):
                m = jnp.asarray(mal.multipliers(("mse_points", "arc_face")),
                                jnp.float32)
                params, opt_state, aux = pose_step(
                    params, opt_state, *shard_batch(plan, pose_b), m)
                scalars = {k: float(v) for k, v in aux.items() if jnp.ndim(v) == 0}
                mal.update({k: scalars[k] for k in ("mse_points", "arc_face")})
                logger.log(**scalars)
                check_finite_loss(aux["loss"], logger.step)

                m = jnp.asarray(mal.multipliers(("mse_latents",)), jnp.float32)
                params, opt_state, aux = hair_step(
                    params, opt_state, *shard_batch(plan, hair_b), m)
                scalars = {k: float(v) for k, v in aux.items() if jnp.ndim(v) == 0}
                mal.update({"mse_latents": scalars["mse_latents"]})
                logger.log(**scalars)

            # per-epoch validation: raw loss sums over the held-out split
            vals = []
            for b in batches(val_pose_rows, POSE_KEYS, args.batch_size,
                             shuffle=False):
                info = val_pose(params, frozen, *shard_batch(plan, b))
                vals.append({k: float(v) for k, v in info.items()})
            for b in batches(val_hair_rows, HAIR_KEYS, args.batch_size,
                             shuffle=False):
                vals.append({"mse_latents": float(
                    val_hair(params, *shard_batch(plan, b)))})
            agg = {}
            for d in vals:
                for k, v in d.items():
                    agg[k] = agg.get(k, 0.0) + v / max(
                        1, sum(1 for e in vals if k in e))
            v_total = sum(agg.values())
            logger.log(**{f"val_{k}": v for k, v in agg.items()},
                       val_loss=v_total)

            if args.grid_dir is not None:
                from hairfastgan_tpu.utils.images import save_image01
                from hairfastgan_tpu.utils.save_utils import image_grid

                rows_imgs = []
                for b in batches(val_pose_rows, POSE_KEYS, args.batch_size,
                                 shuffle=False):
                    gen = np.asarray(render(params, frozen, b[2], b[3]))
                    rows_imgs.append(np.concatenate(
                        [np.asarray(b[0]), gen], axis=2))  # [B,256,512,3]
                    if sum(r.shape[0] for r in rows_imgs) >= 100:
                        break
                if rows_imgs:
                    save_image01(args.grid_dir / f"epoch_{epoch:04d}.png",
                                 image_grid(np.concatenate(rows_imgs)[:100]))

            print(f"epoch {epoch}: val {v_total:.4f}")
            save_train_state(args.ckpt_dir / "last", params, opt_state,
                             logger.step)
            if v_total < best:
                best = v_total
                save_train_state(args.ckpt_dir / "best", params, opt_state,
                                 logger.step)


if __name__ == "__main__":
    main()
