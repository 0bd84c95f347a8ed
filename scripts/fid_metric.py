"""FID / FID-CLIP evaluation CLI — scripts/fid_metric.py port.

Compares each method directory against a real-face dataset directory using
CLIP ViT-B/32 features (FID-CLIP; reference fid_metric.py --clip path /
utils/train.py:125-161). Classic InceptionV3 FID requires the torchvision
weights which are not bundled; the harness accepts any feature extractor.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real_dir", type=Path, required=True)
    ap.add_argument("--method_dirs", type=Path, nargs="+", required=True)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--fid_cache", type=Path, default=None,
                    help="npz cache of the real-dir stats (reference "
                         "input/fid.pkl analog)")
    ap.add_argument("--out_csv", type=Path, default=Path("fid_results.csv"))
    args = ap.parse_args()

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.eval.fid import FIDStats, clip_feature_fn, frechet_distance
    from hairfastgan_tpu.zoo import init_zoo, load_zoo

    cfg = HairFastConfig()
    zoo = (load_zoo(args.zoo_dir, cfg) if args.zoo_dir.exists()
           else init_zoo(jax.random.PRNGKey(0), cfg))
    feat = clip_feature_fn(jax.device_put(zoo["blending"]["clip"]))

    mu_r, cov_r = real_stats(args.real_dir, feat, cache=args.fid_cache,
                             batch=args.batch, limit=args.limit)

    lines = ["method,fid_clip"]
    for md in args.method_dirs:
        fake = load_dir(md, limit=args.limit)
        sf = FIDStats()
        for i in range(0, len(fake), args.batch):
            sf.update(feat(fake[i:i + args.batch]))
        d = frechet_distance(mu_r, cov_r, *sf.finalize())
        print(f"{md.name}: FID-CLIP {d:.4f}")
        lines.append(f"{md.name},{d:.6f}")
    args.out_csv.write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
