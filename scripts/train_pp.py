"""PostProcess encoder training CLI — scripts/pp_train.py port.

Data: .npz rows from scripts/gen_pp_data.py (source/target/target_mask/HT_E,
train/pp.py docstring). Trains PostProcessModel with the LossBuilderMulti
objective; optional adversarial phase (--use_adv, --iter_before) with
discriminator + lazy R1 every --d_reg_every steps, alpha annealing of the F
injection (pp_train.py:133-137: alpha = min(1, step * alpha_rate)).

Per-epoch validation on a held-out split (pp_train.py:185-232): loss terms
without the adversarial component, FID-CLIP of the F-path renders against
--fid_real_dir, [source|target|gen_W|gen_F] grids, best/last checkpoints.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BATCH_KEYS = ("source", "target", "target_mask", "HT_E")


def batches(rows, batch_size, seed=0, shuffle=True, keys=BATCH_KEYS):
    idx = np.arange(len(rows))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        chunk = [np.load(rows[j]) for j in idx[i:i + batch_size]]
        yield tuple(jnp.asarray(np.concatenate([c[k] for c in chunk]))
                    for k in keys)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("checkpoints/pp"))
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--use_adv", action="store_true")
    ap.add_argument("--split_compile", action="store_true",
                    help="compile the encoder step as 3-4 smaller programs "
                         "(grad of a sum = sum of grads) whose unoptimized-"
                         "HLO uploads fit body-capped compile proxies like "
                         "the axon tunnel (HTTP 413 on the fused step); "
                         "~2x forward FLOPs, identical update")
    ap.add_argument("--remat", action="store_true",
                    help="per-render jax.checkpoint; measured ineffective "
                         "on XLA:TPU (it already auto-remats over-budget "
                         "programs, TRAIN_r04.json) — prefer --bf16 for "
                         "larger per-chip batches")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision: bf16 activations + frozen nets, "
                         "f32 Adam masters — the measured full-width memory "
                         "lever (f32 1024^2 fits only B=1 on a 16 GB v5e; "
                         "TRAIN_r04.json)")
    ap.add_argument("--disc_pkl", type=Path, default=None,
                    help="NVlabs ffhq.pkl to start the adversarial phase from "
                         "the pretrained D (reference pp_train.py:59-63); "
                         "defaults to <torch_dir>/StyleGAN/ffhq.pkl if present")
    ap.add_argument("--torch_dir", type=Path, default=Path("pretrained_models"),
                    help="reference pretrained_models/ tree (for ffhq.pkl)")
    ap.add_argument("--iter_before", type=int, default=0,
                    help="steps before the adversarial term kicks in")
    ap.add_argument("--d_reg_every", type=int, default=16)
    ap.add_argument("--alpha_rate", type=float, default=1e-4)
    ap.add_argument("--resume", type=Path, default=None,
                    help="orbax train-state dir to resume from (restores "
                         "params/opt_state/step like pp_train.py:114-119)")
    ap.add_argument("--test_frac", type=float, default=0.1)
    ap.add_argument("--fid_cache", type=Path, default=None,
                    help="npz cache of the real-dir CLIP stats across runs "
                         "(reference input/fid.pkl, utils/train.py:125-161)")
    ap.add_argument("--fid_real_dir", type=Path, default=None,
                    help="real-face dir for per-validation FID-CLIP "
                         "(pp_train.py:221 'FID CLIP')")
    ap.add_argument("--grid_dir", type=Path, default=None,
                    help="dump [source|target|gen_W|gen_F] validation grids")
    ap.add_argument("--log", type=Path, default=Path("pp_train.jsonl"))
    ap.add_argument("--tiny", action="store_true",
                    help="128-res random-weight config (CI smoke runs)")
    ap.add_argument("--micro", action="store_true",
                    help="128-res config with 0.25x trunk widths "
                         "(zoo.init_micro_zoo): exercises the full CLI "
                         "plumbing at a fraction of --tiny's CPU cost; "
                         "program STRUCTURE only, never numerics")
    args = ap.parse_args(argv)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.losses.perceptual import init_lpips_alex
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.models.stylegan2_discriminator import init_discriminator
    from hairfastgan_tpu.params.checkpoint import save_train_state
    from hairfastgan_tpu.parallel import data_mesh_for_batch, replicate, shard_batch
    from hairfastgan_tpu.train.common import MetricLogger, check_finite_loss
    from hairfastgan_tpu.train.pp import make_pp_train_steps
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    key = jax.random.PRNGKey(0)
    trunk_width = 1.0
    if args.micro:
        # numpy-fast init like main.py/gen_rotate_data --micro (jax.random
        # init costs ~minutes of tiny dispatches on a 1-core host)
        from hairfastgan_tpu.zoo import init_micro_zoo_fast

        zoo, cfg = init_micro_zoo_fast(0)
        trunk_width = 0.25  # frozen loss nets match the micro zoo's scale
    elif args.tiny:
        from hairfastgan_tpu.zoo import init_tiny_zoo

        zoo, cfg = init_tiny_zoo(key)
    else:
        cfg = HairFastConfig()
        zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
               else init_zoo(key, cfg))
    # frozen loss nets: BiSeNet-16 (seg.pth), IR-SE-50 id, LPIPS-alex.
    # With a converted checkpoint dir these come from it; otherwise random
    # init (pipeline-shape-correct, for dry runs).
    frozen = {
        "generator": zoo["generator"],
        "bisenet16": bisenet.init_bisenet(key, n_classes=16,
                                          width=trunk_width),
        "id_backbone": init_irse_backbone(key, width=trunk_width),
        "lpips": init_lpips_alex(key),
    }
    params = zoo["post_process"]

    # cap the data mesh at the batch size: a global batch smaller than
    # the device count (tiny CI runs, small final batches) must not be
    # forced onto the full mesh (shard_batch needs divisibility); warns
    # when devices go idle (parallel.mesh.data_mesh_for_batch)
    plan = data_mesh_for_batch(args.batch_size)
    frozen = replicate(plan, frozen)
    params = replicate(plan, params)

    compute_dtype = jnp.bfloat16 if args.bf16 else None
    if args.bf16:
        # keep the frozen nets RESIDENT in bf16 (halves their HBM; the
        # in-loss cast would otherwise hold both copies live)
        from hairfastgan_tpu.zoo import cast_zoo
        frozen = cast_zoo(frozen, jnp.bfloat16)
    enc_step, disc_step, r1_step, tx, d_tx = make_pp_train_steps(
        frozen, cfg=cfg, lr=args.lr, use_adv=args.use_adv,
        remat=args.remat, compute_dtype=compute_dtype)
    if args.split_compile:
        # same update, 3-4 smaller programs: for links that cap the
        # unoptimized-HLO upload (axon remote_compile HTTP 413)
        from hairfastgan_tpu.train.pp import make_pp_split_train_step

        enc_step, tx = make_pp_split_train_step(
            frozen, cfg=cfg, lr=args.lr, use_adv=args.use_adv,
            remat=args.remat, compute_dtype=compute_dtype)
    opt_state = replicate(plan, tx.init(params))

    disc_params = d_opt = None
    if args.use_adv:
        pkl = args.disc_pkl or (args.torch_dir / "StyleGAN" / "ffhq.pkl")
        if pkl.exists():
            from hairfastgan_tpu.params.nvlabs import load_nvlabs_discriminator

            disc_params = jax.tree.map(
                jnp.asarray, load_nvlabs_discriminator(str(pkl),
                                                       size=cfg.stylegan.size))
            print(f"adversarial phase starts from pretrained D: {pkl}")
        else:
            disc_params = init_discriminator(key, cfg.stylegan)
            print(f"WARNING: {pkl} not found — adversarial phase starts from "
                  "a RANDOM discriminator (the reference uses the pretrained "
                  "ffhq.pkl D, pp_train.py:59-63)")
        disc_params = replicate(plan, disc_params)
        d_opt = replicate(plan, d_tx.init(disc_params))

    rows = sorted(Path(args.data_dir).glob("*.npz"))
    n_val = max(1, int(len(rows) * args.test_frac))
    val_rows, rows = rows[:n_val], rows[n_val:]

    # adversarial reals: the FULL-RES source (reference pp_train.py:125,162
    # feeds source_1024 to D and R1). Rows from gen_pp_data.py carry it as
    # 'source_full'; older rows without it fall back to upsampling the 256
    # source (distribution is blurrier — regenerate the data if possible).
    train_keys = BATCH_KEYS
    upsample_reals = False
    if args.use_adv and rows:
        if "source_full" in np.load(rows[0]).files:
            train_keys = BATCH_KEYS + ("source_full",)
        else:
            upsample_reals = True
            print("WARNING: rows lack 'source_full' — adversarial reals are "
                  "the 256 sources upsampled to generator res; regenerate "
                  "with scripts/gen_pp_data.py for true full-res reals")

    logger = MetricLogger(str(args.log))
    step_i = 0
    best = float("inf")

    # validation loss (no adversarial term, alpha=1 — pp_train.py:196-210)
    from hairfastgan_tpu.train.pp import pp_loss

    # frozen as jit ARGUMENT (closure arrays embed as HLO literals)
    val_fn = jax.jit(lambda p, fr, *b: pp_loss(p, fr, b, alpha=1.0, cfg=cfg))

    fid_real = None
    feat_fn = None
    if args.fid_real_dir is not None:
        from hairfastgan_tpu.eval.fid import clip_feature_fn
        from scripts.fid_metric import real_stats

        feat_fn = clip_feature_fn(zoo["blending"]["clip"])
        fid_real = real_stats(args.fid_real_dir, feat_fn, size=256,
                              cache=args.fid_cache)

    if args.resume is not None:
        from hairfastgan_tpu.params.checkpoint import restore_train_state

        state = restore_train_state(args.resume)
        params = jax.tree.map(jnp.asarray, state["params"])
        opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        step_i = int(state["step"])
        if args.use_adv and "disc" in state:
            disc_params = jax.tree.map(jnp.asarray, state["disc"])
        print(f"resumed from {args.resume} at step {step_i}")

    if upsample_reals:
        from hairfastgan_tpu.ops.resample import resize as _resize

        size = cfg.stylegan.size
        up_fn = jax.jit(lambda x: _resize(x, (size, size), "bilinear"))

    with plan.mesh:
        for epoch in range(args.epochs):
            for full in batches(rows, args.batch_size, seed=epoch,
                                keys=train_keys):
                full = shard_batch(plan, full)
                batch, source_full = full[:4], (full[4] if len(full) > 4
                                                else None)
                alpha = min(1.0, args.alpha_rate * step_i)
                if args.use_adv:
                    # warm-up passes disc=None: the adv-free trace of the
                    # same step (loss_fn unpacks *batch, disc, alpha)
                    d = (disc_params if step_i >= args.iter_before else None)
                    params, opt_state, aux = enc_step(
                        params, opt_state, *batch, d, alpha)
                else:
                    params, opt_state, aux = enc_step(params, opt_state,
                                                      *batch, alpha)
                scalars = {k: v for k, v in aux.items() if jnp.ndim(v) == 0}
                logger.log(**scalars)
                check_finite_loss(aux["loss"], step_i)

                if args.use_adv and step_i >= args.iter_before and disc_step:
                    real = (source_full if source_full is not None
                            else up_fn(batch[0]))
                    fake = aux["gen_f"]
                    disc_params, d_opt, d_aux = disc_step(disc_params, d_opt,
                                                          real, fake)
                    logger.log(disc_adv=float(d_aux["disc_adv"]),
                               disc_grad_norm=float(d_aux["grad_norm"]))
                    if step_i % args.d_reg_every == 0:
                        r1 = r1_step(disc_params, real)
                        logger.log(r1=float(r1))
                step_i += 1

            # per-epoch validation (pp_train.py:185-232)
            v_totals, v_terms, gen_f_all, grid_rows = [], {}, [], []
            for b in batches(val_rows, args.batch_size, shuffle=False):
                b = shard_batch(plan, b)
                total, aux = val_fn(params, frozen, *b)
                v_totals.append(float(total))
                for k, v in aux.items():
                    if jnp.ndim(v) == 0:
                        v_terms.setdefault(k, []).append(float(v))
                gf = np.clip((np.asarray(aux["gen_f_256"]) + 1) / 2, 0, 1)
                gen_f_all.append(gf)
                if args.grid_dir is not None:
                    gw = np.clip((np.asarray(aux["gen_w_256"]) + 1) / 2, 0, 1)
                    src = np.clip((np.asarray(b[0]) + 1) / 2, 0, 1)
                    tgt = np.clip((np.asarray(b[1]) + 1) / 2, 0, 1)
                    grid_rows.append(np.concatenate([src, tgt, gw, gf], axis=2))
            v = float(np.mean(v_totals)) if v_totals else float("nan")
            logger.log(val_loss=v, **{f"val_{k}": float(np.mean(vs))
                                      for k, vs in v_terms.items()})

            extra = ""
            if feat_fn is not None and gen_f_all:
                from hairfastgan_tpu.eval.fid import FIDStats, frechet_distance

                sf = FIDStats()
                renders = np.concatenate(gen_f_all)
                for i in range(0, len(renders), 64):
                    sf.update(feat_fn(renders[i:i + 64]))
                fid = frechet_distance(*fid_real, *sf.finalize())
                logger.log(fid_clip=fid)
                extra = f" fid-clip {fid:.3f}"
            if args.grid_dir is not None and grid_rows:
                from hairfastgan_tpu.utils.images import save_image01
                from hairfastgan_tpu.utils.save_utils import image_grid

                save_image01(args.grid_dir / f"epoch_{epoch:04d}.png",
                             image_grid(np.concatenate(grid_rows)[:100]))

            print(f"epoch {epoch}: val {v:.4f}{extra} ({step_i} steps)")
            save_train_state(args.ckpt_dir / "last", params, opt_state, step_i,
                             disc_params=disc_params)
            if v < best:
                best = v
                save_train_state(args.ckpt_dir / "best", params, opt_state,
                                 step_i, disc_params=disc_params)


if __name__ == "__main__":
    main()
