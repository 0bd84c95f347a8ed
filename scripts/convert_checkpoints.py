"""One-command conversion: reference pretrained_models/ -> orbax zoo.

Maps every checkpoint of SURVEY.md §2.12 through params/convert.py and
writes a single orbax pytree the runtime loads directly (fast path vs
re-converting torch files at startup).

Usage:
  python scripts/convert_checkpoints.py \
      --torch_dir pretrained_models --out_dir pretrained_models_jax
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", type=Path, required=True,
                    help="the reference's pretrained_models/ tree")
    ap.add_argument("--out_dir", type=Path, required=True)
    args = ap.parse_args()

    import jax

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.params.checkpoint import save_pytree
    from hairfastgan_tpu.zoo import load_zoo

    # load_zoo drives all converters; it expects the torch layout
    zoo = load_zoo(args.torch_dir, HairFastConfig())
    n_params = sum(x.size for x in jax.tree.leaves(zoo)
                   if hasattr(x, "size"))
    save_pytree(args.out_dir / "zoo", zoo)
    print(f"converted zoo: {n_params / 1e6:.1f}M params -> {args.out_dir}/zoo")


if __name__ == "__main__":
    main()
