"""Batch FFHQ-style face alignment — scripts/align_face.py port.

Crops in-the-wild photos to the 1024^2 FFHQ frame the pipeline expects
(utils/face_align.py). Landmark provider: the on-device STAR model when
its checkpoint is in --zoo_dir (no dlib needed), else dlib + the
shape_predictor_68 model; fails loudly when neither is available.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", type=Path, required=True)
    ap.add_argument("--output_dir", type=Path, required=True)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--dlib", action="store_true",
                    help="force the dlib provider even when the STAR "
                         "checkpoint is present (reference-exact landmarks)")
    args = ap.parse_args()

    from hairfastgan_tpu.utils.face_align import align_faces
    from hairfastgan_tpu.utils.images import save_image01, to_raw_image

    star_p = None
    star_ckpt = args.zoo_dir / "star_wflw.pth"
    if star_ckpt.exists() and not args.dlib:
        import jax

        from hairfastgan_tpu.models import star
        from hairfastgan_tpu.params.convert import load_torch_state_dict

        star_p = jax.device_put(
            star.convert_star(load_torch_state_dict(str(star_ckpt), key="net")))
        print("landmarks: STAR (on-device)")

    args.output_dir.mkdir(parents=True, exist_ok=True)
    paths = sorted(p for p in args.input_dir.iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    for p in paths:
        aligned = align_faces([to_raw_image(p)], output_size=args.size,
                              star_params=star_p)[0]
        save_image01(args.output_dir / f"{p.stem}.png", aligned)
        print(p.name)


if __name__ == "__main__":
    main()
