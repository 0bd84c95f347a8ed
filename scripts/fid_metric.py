"""FID / FID-CLIP evaluation CLI — scripts/fid_metric.py port.

Compares each method directory against a real-face dataset directory and,
like the reference (`scripts/fid_metric.py:62-72`), emits BOTH metric
columns in one invocation: classic FID over InceptionV3 pool3 features
(`--inception_ckpt`, a torchvision inception_v3 state_dict converted via
models/inception.convert_inception) and FID-CLIP over CLIP ViT-B/32
embeddings (utils/train.py:125-161). Without `--inception_ckpt` only the
FID-CLIP column is produced (random Inception weights would make the FID
number meaningless).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def load_dir(d: Path, size: int = 299, limit: int = 0):
    from hairfastgan_tpu.data.native_loader import NativeImageLoader, native_available
    from hairfastgan_tpu.utils.images import to_image_array

    paths = sorted(p for p in Path(d).iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    if limit:
        paths = paths[:limit]
    if native_available():
        loader = NativeImageLoader([str(p) for p in paths], out_size=size,
                                   threads=4)
        out = np.empty((len(paths), size, size, 3), np.float32)
        for i, img in loader:
            out[i] = img
        return out
    return np.stack([to_image_array(p, size) for p in paths])


def real_stats(real_dir: Path, feat_fn, cache: Path = None, size: int = 299,
               batch: int = 64, limit: int = 0):
    """(mu, cov) of a real-image dir through feat_fn, npz-cached across
    runs — the reference caches real-dataset FID stats in input/fid.pkl
    (utils/train.py:125-161); re-featurizing thousands of images every
    training run is the expensive part."""
    from hairfastgan_tpu.eval.fid import FIDStats

    if cache is not None and Path(cache).exists():
        return FIDStats.load(cache).finalize()
    imgs = load_dir(real_dir, size=size, limit=limit)
    s = FIDStats()
    for i in range(0, len(imgs), batch):
        s.update(feat_fn(imgs[i:i + batch]))
    if cache is not None:
        Path(cache).parent.mkdir(parents=True, exist_ok=True)
        s.save(cache)
    return s.finalize()


def load_inception_feature_fn(ckpt: Path):
    """torchvision inception_v3 state_dict -> jitted pool3 feature fn."""
    import torch

    from hairfastgan_tpu.eval.fid import inception_feature_fn
    from hairfastgan_tpu.models.inception import convert_inception

    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict) or "Conv2d_1a_3x3.conv.weight" not in sd:
        sd = sd.get("state_dict", sd)
    # converters take numpy (convert.py layout rules use np transpose args)
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params = jax.device_put(jax.tree.map(np.asarray, convert_inception(sd)))
    return inception_feature_fn(params)


def _feature_cache(base: Path, name: str) -> Path:
    """Per-feature-net real-stats cache path (the two nets' stats are
    different arrays; a shared file would silently mix them)."""
    if base is None:
        return None
    return base.with_name(f"{base.stem}_{name}{base.suffix or '.npz'}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--real_dir", type=Path, required=True)
    ap.add_argument("--method_dirs", type=Path, nargs="+", required=True)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--inception_ckpt", type=Path, default=None,
                    help="torchvision inception_v3 state_dict (.pth); adds "
                         "the classic-FID column like the reference "
                         "scripts/fid_metric.py:62-66")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--size", type=int, default=299,
                    help="feature-net input resolution (reference loads at "
                         "299, fid_metric.py:19; smaller is useful in tests)")
    ap.add_argument("--fid_cache", type=Path, default=None,
                    help="base path for npz caches of the real-dir stats, "
                         "suffixed per feature net (reference input/fid.pkl "
                         "analog)")
    ap.add_argument("--out_csv", type=Path, default=Path("fid_results.csv"))
    args = ap.parse_args(argv)

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.eval.fid import FIDStats, clip_feature_fn, frechet_distance
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    cfg = HairFastConfig()
    zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
           else init_zoo(jax.random.PRNGKey(0), cfg))

    # column order mirrors the reference CSV: FID first, then FID_CLIP
    feats = []
    if args.inception_ckpt is not None:
        feats.append(("fid", load_inception_feature_fn(args.inception_ckpt)))
    feats.append(("fid_clip", clip_feature_fn(jax.device_put(
        zoo["blending"]["clip"]))))

    stats_r = {name: real_stats(args.real_dir, fn,
                                cache=_feature_cache(args.fid_cache, name),
                                size=args.size, batch=args.batch,
                                limit=args.limit)
               for name, fn in feats}

    lines = ["method," + ",".join(name for name, _ in feats)]
    for md in args.method_dirs:
        fake = load_dir(md, size=args.size, limit=args.limit)
        row = []
        for name, fn in feats:
            sf = FIDStats()
            for i in range(0, len(fake), args.batch):
                sf.update(fn(fake[i:i + args.batch]))
            d = frechet_distance(*stats_r[name], *sf.finalize())
            row.append(d)
            print(f"{md.name}: {name.upper().replace('_', '-')} {d:.4f}")
        lines.append(md.name + "," + ",".join(f"{d:.6f}" for d in row))
    args.out_csv.write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
