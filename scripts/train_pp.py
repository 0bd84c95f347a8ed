"""PostProcess encoder training CLI — scripts/pp_train.py port.

Data: .npz rows from scripts/gen_pp_data.py (source/target/target_mask/HT_E,
train/pp.py docstring). Trains PostProcessModel with the LossBuilderMulti
objective; optional adversarial phase (--use_adv, --iter_before) with
discriminator + lazy R1 every --d_reg_every steps, alpha annealing of the F
injection (pp_train.py:133-137: alpha = min(1, step * alpha_rate)).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BATCH_KEYS = ("source", "target", "target_mask", "HT_E")


def batches(rows, batch_size, seed=0, shuffle=True):
    idx = np.arange(len(rows))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        chunk = [np.load(rows[j]) for j in idx[i:i + batch_size]]
        yield tuple(jnp.asarray(np.concatenate([c[k] for c in chunk]))
                    for k in BATCH_KEYS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("checkpoints/pp"))
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--use_adv", action="store_true")
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
    ap.add_argument("--log", type=Path, default=Path("pp_train.jsonl"))
    args = ap.parse_args()

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.losses.perceptual import init_lpips_alex
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.models.stylegan2_discriminator import init_discriminator
    from hairfastgan_tpu.params.checkpoint import save_train_state
    from hairfastgan_tpu.parallel import make_mesh, replicate, shard_batch
    from hairfastgan_tpu.train.common import MetricLogger, check_finite_loss
    from hairfastgan_tpu.train.pp import make_pp_train_steps
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    cfg = HairFastConfig()
    key = jax.random.PRNGKey(0)
    zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
           else init_zoo(key, cfg))
    # frozen loss nets: BiSeNet-16 (seg.pth), IR-SE-50 id, LPIPS-alex.
    # With a converted checkpoint dir these come from it; otherwise random
    # init (pipeline-shape-correct, for dry runs).
    frozen = {
        "generator": zoo["generator"],
        "bisenet16": bisenet.init_bisenet(key, n_classes=16),
        "id_backbone": init_irse_backbone(key),
        "lpips": init_lpips_alex(key),
    }
    params = zoo["post_process"]

    plan = make_mesh()
    frozen = replicate(plan, frozen)
    params = replicate(plan, params)

    enc_step, disc_step, r1_step, tx, d_tx = make_pp_train_steps(
        frozen, cfg=cfg, lr=args.lr, use_adv=args.use_adv)
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
    logger = MetricLogger(str(args.log))
    step_i = 0

    if args.resume is not None:
        from hairfastgan_tpu.params.checkpoint import restore_train_state

        state = restore_train_state(args.resume)
        params = jax.tree.map(jnp.asarray, state["params"])
        opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        step_i = int(state["step"])
        if args.use_adv and "disc" in state:
            disc_params = jax.tree.map(jnp.asarray, state["disc"])
        print(f"resumed from {args.resume} at step {step_i}")

    with plan.mesh:
        for epoch in range(args.epochs):
            for batch in batches(rows, args.batch_size, seed=epoch):
                batch = shard_batch(plan, batch)
                alpha = min(1.0, args.alpha_rate * step_i)
                if args.use_adv and step_i >= args.iter_before:
                    params, opt_state, aux = enc_step(
                        params, opt_state, *batch, disc_params, alpha)
                else:
                    params, opt_state, aux = enc_step(params, opt_state,
                                                      *batch, alpha)
                scalars = {k: v for k, v in aux.items() if jnp.ndim(v) == 0}
                logger.log(**scalars)
                check_finite_loss(aux["loss"], step_i)

                if args.use_adv and step_i >= args.iter_before and disc_step:
                    real = batch[1]  # target images stand in for reals
                    fake = aux["gen_f_256"]
                    disc_params, d_opt, d_aux = disc_step(disc_params, d_opt,
                                                          real, fake)
                    if step_i % args.d_reg_every == 0:
                        r1 = r1_step(disc_params, real)
                        logger.log(r1=float(r1))
                step_i += 1

            save_train_state(args.ckpt_dir / "last", params, opt_state, step_i,
                             disc_params=disc_params)
            print(f"epoch {epoch} done ({step_i} steps)")


if __name__ == "__main__":
    main()
