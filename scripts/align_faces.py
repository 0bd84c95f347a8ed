"""Batch FFHQ-style face alignment — scripts/align_face.py port.

Crops in-the-wild photos to the 1024^2 FFHQ frame the pipeline expects
(dlib 68-landmark quad crop, utils/face_align.py). Requires dlib + the
shape_predictor_68 model; fails loudly when absent.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", type=Path, required=True)
    ap.add_argument("--output_dir", type=Path, required=True)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    from hairfastgan_tpu.utils.face_align import align_faces
    from hairfastgan_tpu.utils.images import save_image01, to_image_array

    args.output_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted(p for p in args.input_dir.iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    import numpy as np
    from PIL import Image

    for p in paths:
        raw = np.asarray(Image.open(p).convert("RGB")).astype(np.float32) / 255
        aligned = align_faces([raw], output_size=args.size)[0]
        save_image01(args.output_dir / f"{p.stem}.png", aligned)
        print(p.name)


if __name__ == "__main__":
    main()
