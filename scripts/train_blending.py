"""Blending (color) encoder training CLI — scripts/blending_train.py port.

Data: a directory of .npz rows produced by scripts/gen_blending_data.py
(keys = the Blending_dataset layout, train/blending.py docstring). Trains
the ModulationModule stack with Adam(1e-4)+clip(5) under a data-parallel
mesh; validates with held-out loss; keeps best/last orbax checkpoints.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BATCH_KEYS = ("color_s", "align_s", "align_f", "color_i", "face_i",
              "target_mask", "HM_3E", "HM_XE")


def load_rows(data_dir: Path):
    rows = sorted(Path(data_dir).glob("*.npz"))
    if not rows:
        raise FileNotFoundError(f"no .npz rows in {data_dir}")
    return rows


def batches(rows, batch_size, seed=0, shuffle=True):
    idx = np.arange(len(rows))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        chunk = [np.load(rows[j]) for j in idx[i:i + batch_size]]
        yield tuple(jnp.asarray(np.concatenate([c[k] for c in chunk]))
                    for k in BATCH_KEYS)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("checkpoints/blending"))
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--test_frac", type=float, default=0.1)
    ap.add_argument("--fid_cache", type=Path, default=None,
                    help="npz cache of the real-dir CLIP stats across runs "
                         "(reference input/fid.pkl, utils/train.py:125-161)")
    ap.add_argument("--fid_real_dir", type=Path, default=None,
                    help="real-face dir for per-validation FID-CLIP "
                         "(blending_train.py:127-167)")
    ap.add_argument("--grid_dir", type=Path, default=None,
                    help="dump validation render grids here")
    ap.add_argument("--log", type=Path, default=Path("blending_train.jsonl"))
    ap.add_argument("--tiny", action="store_true",
                    help="128-res random-weight config (CI smoke runs); "
                         "align_f rows stay 32x32x512 — the FS interface "
                         "is structural (zoo.init_tiny_zoo)")
    args = ap.parse_args(argv)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.params.checkpoint import save_train_state
    from hairfastgan_tpu.parallel import data_mesh_for_batch, replicate, shard_batch
    from hairfastgan_tpu.train.blending import make_blending_train_step, blending_loss
    from hairfastgan_tpu.train.common import MetricLogger, check_finite_loss
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    key = jax.random.PRNGKey(0)
    if args.tiny:
        from hairfastgan_tpu.config import StyleGANConfig
        from hairfastgan_tpu.models import clip_vit
        from hairfastgan_tpu.models import encoders as enc_init
        from hairfastgan_tpu.models import stylegan2 as sg2_init

        # max_channels stays 512: blend renders G[4..8](layer_in=align_f)
        # and align_f is the structural 512ch@32^2 F (pair 3) even at
        # reduced generator resolution
        cfg = HairFastConfig(stylegan=StyleGANConfig(size=128))
        k1, k2, k3 = jax.random.split(key, 3)
        clip_params = clip_vit.init_clip_image_tower(
            k1, width=64, layers=2, heads=2, embed_dim=512)
        blending = enc_init.init_blending_model(k2, clip_params=clip_params)
        frozen = {"generator": sg2_init.init_generator_params(k3, cfg.stylegan),
                  "clip": blending["clip"]}
        params = {"mods": blending["mods"]}
    else:
        cfg = HairFastConfig()
        zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
               else init_zoo(key, cfg))
        frozen = {"generator": zoo["generator"], "clip": zoo["blending"]["clip"]}
        params = {"mods": zoo["blending"]["mods"]}

    # cap the data mesh at the batch size: a global batch smaller than
    # the device count (tiny CI runs, small final batches) must not be
    # forced onto the full mesh (shard_batch needs divisibility); warns
    # when devices go idle (parallel.mesh.data_mesh_for_batch)
    plan = data_mesh_for_batch(args.batch_size)
    frozen = replicate(plan, frozen)
    params = replicate(plan, params)

    step, tx = make_blending_train_step(frozen, cfg, lr=args.lr)
    opt_state = replicate(plan, tx.init(params))

    rows = load_rows(args.data_dir)
    n_test = max(1, int(len(rows) * args.test_frac))
    test_rows, train_rows = rows[:n_test], rows[n_test:]

    # frozen as jit ARGUMENT (closure arrays embed as HLO literals)
    val_loss = jax.jit(lambda p, fr, *b: blending_loss(p, fr, b, cfg)[0])
    logger = MetricLogger(str(args.log))
    best = float("inf")

    # validation renders for FID-CLIP / grids (blend -> G[4..8] @256)
    from hairfastgan_tpu.models import encoders, stylegan2
    from hairfastgan_tpu.pipeline.embedding import to_res

    @jax.jit
    def render_val(params, fr, color_s, align_s, align_f, color_i, face_i,
                   target_mask, hm3e, hmxe):
        pp = dict(params, clip=fr["clip"])
        blend = encoders.blending_model(pp, align_s[:, 6:], color_s[:, 6:],
                                        face_i * target_mask, color_i * hm3e)
        latent = jnp.concatenate(
            [jnp.zeros((blend.shape[0], 6, 512), blend.dtype), blend], axis=1)
        _, img = stylegan2.synthesis(fr["generator"], latent,
                                     start_layer=4, end_layer=8,
                                     layer_in=align_f, cfg=cfg.stylegan)
        return jnp.clip((to_res(img, 256) + 1) / 2, 0, 1)

    feat_fn = None
    if args.fid_real_dir is not None:
        from hairfastgan_tpu.eval.fid import clip_feature_fn
        from scripts.fid_metric import real_stats

        feat_fn = clip_feature_fn(frozen["clip"])
        fid_real = real_stats(args.fid_real_dir, feat_fn, size=256,
                              cache=args.fid_cache)

    with plan.mesh:
        for epoch in range(args.epochs):
            for batch in batches(train_rows, args.batch_size, seed=epoch):
                batch = shard_batch(plan, batch)
                params, opt_state, aux = step(params, opt_state, *batch)
                logger.log(loss=aux["loss"], face=aux["face_loss"],
                           hair=aux["hair_loss"], grad=aux["grad_norm"])
                check_finite_loss(aux["loss"], logger.step)

            vls = [float(val_loss(params, frozen, *shard_batch(plan, b)))
                   for b in batches(test_rows, args.batch_size, shuffle=False)]
            v = float(np.mean(vls)) if vls else float("nan")
            logger.log(val_loss=v)

            extra = ""
            if feat_fn is not None or args.grid_dir is not None:
                renders = [np.asarray(render_val(params, frozen, *b))
                           for b in batches(test_rows, args.batch_size,
                                            shuffle=False)]
                if renders:
                    renders = np.concatenate(renders)
                    if feat_fn is not None:
                        from hairfastgan_tpu.eval.fid import FIDStats, frechet_distance

                        sf = FIDStats()
                        for i in range(0, len(renders), 64):
                            sf.update(feat_fn(renders[i:i + 64]))
                        fid = frechet_distance(*fid_real, *sf.finalize())
                        logger.log(fid_clip=fid)
                        extra += f" fid-clip {fid:.3f}"
                    if args.grid_dir is not None:
                        from hairfastgan_tpu.utils.images import save_image01
                        from hairfastgan_tpu.utils.save_utils import image_grid

                        save_image01(args.grid_dir / f"epoch_{epoch:04d}.png",
                                     image_grid(renders[:100]))
            print(f"epoch {epoch}: val {v:.4f}{extra}")
            save_train_state(args.ckpt_dir / "last", params, opt_state, logger.step)
            if v < best:
                best = v
                save_train_state(args.ckpt_dir / "best", params, opt_state, logger.step)


if __name__ == "__main__":
    main()
