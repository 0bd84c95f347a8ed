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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", type=Path, required=True)
    ap.add_argument("--ckpt_dir", type=Path, default=Path("checkpoints/blending"))
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--test_frac", type=float, default=0.1)
    ap.add_argument("--log", type=Path, default=Path("blending_train.jsonl"))
    args = ap.parse_args()

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.params.checkpoint import save_train_state
    from hairfastgan_tpu.parallel import make_mesh, replicate, shard_batch
    from hairfastgan_tpu.train.blending import make_blending_train_step, blending_loss
    from hairfastgan_tpu.train.common import MetricLogger, check_finite_loss
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    cfg = HairFastConfig()
    zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
           else init_zoo(jax.random.PRNGKey(0), cfg))
    frozen = {"generator": zoo["generator"], "clip": zoo["blending"]["clip"]}
    params = {"mods": zoo["blending"]["mods"]}

    plan = make_mesh()
    frozen = replicate(plan, frozen)
    params = replicate(plan, params)

    step, tx = make_blending_train_step(frozen, cfg, lr=args.lr)
    opt_state = replicate(plan, tx.init(params))

    rows = load_rows(args.data_dir)
    n_test = max(1, int(len(rows) * args.test_frac))
    test_rows, train_rows = rows[:n_test], rows[n_test:]

    val_loss = jax.jit(lambda p, *b: blending_loss(p, frozen, b, cfg)[0])
    logger = MetricLogger(str(args.log))
    best = float("inf")

    with plan.mesh:
        for epoch in range(args.epochs):
            for batch in batches(train_rows, args.batch_size, seed=epoch):
                batch = shard_batch(plan, batch)
                params, opt_state, aux = step(params, opt_state, *batch)
                logger.log(loss=aux["loss"], face=aux["face_loss"],
                           hair=aux["hair_loss"], grad=aux["grad_norm"])
                check_finite_loss(aux["loss"], logger.step)

            vls = [float(val_loss(params, *shard_batch(plan, b)))
                   for b in batches(test_rows, args.batch_size, shuffle=False)]
            v = float(np.mean(vls)) if vls else float("nan")
            print(f"epoch {epoch}: val {v:.4f}")
            save_train_state(args.ckpt_dir / "last", params, opt_state, logger.step)
            if v < best:
                best = v
                save_train_state(args.ckpt_dir / "best", params, opt_state, logger.step)


if __name__ == "__main__":
    main()
