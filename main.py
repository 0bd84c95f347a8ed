"""CLI runner: single triple or a batch file of triples.

Mirrors reference main.py:12-80: either --face_path/--shape_path/--color_path
for one transfer, or --file_path with lines "face shape color" relative to
--input_dir. Adds --batch (new): group same-case triples into device batches
for TPU throughput instead of the reference's sequential python loop.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from hairfastgan_tpu.api import HairFast, config_from_args, get_parser
from hairfastgan_tpu.utils.images import save_image01


def main(model_args: argparse.Namespace, args: argparse.Namespace) -> None:
    if getattr(args, "tiny", False) or getattr(args, "micro", False):
        # 128-res random-weight smoke configs (CI runs the CLI end-to-end);
        # --micro additionally scales trunk widths 0.25x (program structure
        # only — a fraction of --tiny's CPU execution cost)
        import dataclasses

        import jax

        if args.micro:
            from hairfastgan_tpu.zoo import init_micro_zoo_fast

            zoo, cfg = init_micro_zoo_fast(0)
        else:
            from hairfastgan_tpu.zoo import init_tiny_zoo

            zoo, cfg = init_tiny_zoo(jax.random.PRNGKey(0))
        cfg = dataclasses.replace(cfg, compute_dtype="float32",
                                  compile_cache_dir=None)
        hair_fast = HairFast(cfg, zoo=zoo)
    else:
        hair_fast = HairFast(config_from_args(model_args))

    experiments: list[tuple[Path, Path, Path]] = []
    if args.file_path is not None:
        with open(args.file_path) as f:
            for line in f:
                if line.strip():
                    experiments.append(tuple(line.split()))
    else:
        experiments.append((args.face_path, args.shape_path, args.color_path))

    args.output_dir.mkdir(parents=True, exist_ok=True)

    if args.batch > 1:
        # TPU throughput mode: one XLA dispatch per batch of triples.
        # Ship uint8 (the device normalizes): 4x less host->device upload,
        # same programs as the single-swap path.
        from hairfastgan_tpu.utils.images import to_image_u8

        up = hair_fast._upload_res(args.upload_res)
        load = lambda p: to_image_u8(p, up)
        if args.align:
            from hairfastgan_tpu.utils.face_align import align_faces
            from hairfastgan_tpu.utils.images import to_raw_image

            aligned: dict = {}
            star_p = hair_fast.zoo.get("star")

            def load(p):  # align once per unique photo, then reuse
                if p not in aligned:
                    a = align_faces(
                        [to_raw_image(p)],
                        output_size=hair_fast.cfg.stylegan.size,
                        star_params=star_p)[0]
                    a8 = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
                    aligned[p] = to_image_u8(a8, up)
                return aligned[p]

        # group triples by dedup case (path identity) so duplicates take
        # the same static fast-path programs a single swap() would — the
        # reference short-circuits inside Alignment/Blending when images
        # are the same object, which is not numerically identical to
        # running the distinct math on equal inputs
        def triple_case(f, s, c):
            if f == s == c:
                return "same"
            if s == c:
                return "shape_eq_color"
            if f == s:
                return "face_eq_shape"
            if f == c:
                return "face_eq_color"
            return "distinct"

        groups: dict[str, list] = {}
        for exp in experiments:
            groups.setdefault(triple_case(*exp), []).append(exp)

        for case, exps in groups.items():
            for i in range(0, len(exps), args.batch):
                chunk = exps[i:i + args.batch]
                faces = np.stack([load(args.input_dir / f) for f, _, _ in chunk])
                shapes = np.stack([load(args.input_dir / s) for _, s, _ in chunk])
                colors = np.stack([load(args.input_dir / c) for _, _, c in chunk])
                # uint8 from the device: the PNG quantization happens
                # on-chip and the download shrinks 4x
                outs = hair_fast.swap_batch(faces, shapes, colors,
                                            case=case, output="uint8")
                for (f, s, c), out in zip(chunk, outs):
                    name = "_".join(Path(p).stem for p in (f, s, c))
                    save_image01(args.output_dir / f"{name}.png", out)
        return

    for exp in experiments:
        face, shape, color = (args.input_dir / p for p in exp)
        out = hair_fast.swap(face, shape, color, benchmark=args.benchmark,
                             align=args.align,
                             poisson=args.poisson, output="uint8",
                             upload_res=args.upload_res,
                             output_res=args.output_res,
                             exp_name="_".join(Path(p).stem for p in exp))
        name = "_".join(Path(p).stem for p in exp)
        save_image01(args.output_dir / f"{name}.png", out)

    if args.benchmark:
        hair_fast.bench.report()


if __name__ == "__main__":
    model_parser = get_parser()
    parser = argparse.ArgumentParser(description="HairFast-TPU runner",
                                     parents=[model_parser], add_help=False)
    parser.add_argument("--input_dir", type=Path, default=Path(""))
    parser.add_argument("--face_path", type=Path, default=None)
    parser.add_argument("--shape_path", type=Path, default=None)
    parser.add_argument("--color_path", type=Path, default=None)
    parser.add_argument("--file_path", type=Path, default=None)
    parser.add_argument("--output_dir", type=Path, default=Path("output"))
    parser.add_argument("--benchmark", action="store_true")
    parser.add_argument("--batch", type=int, default=1,
                        help="triples per device batch (TPU throughput mode)")
    parser.add_argument("--tiny", action="store_true",
                        help="128-res random-weight config (CI smoke runs)")
    parser.add_argument("--micro", action="store_true",
                        help="--tiny with 0.25x trunk widths (cheapest CI "
                             "smoke; program structure only)")
    parser.add_argument("--align", action="store_true",
                        help="FFHQ-align in-the-wild photos first (STAR "
                             "on-device landmarks when star_wflw.pth is in "
                             "the zoo, else dlib)")
    parser.add_argument("--upload_res", type=int, default=None,
                        help="ship inputs at this resolution (e.g. 512): "
                             "the pipeline's working spaces are <=512, so "
                             "only the first downsample moves host-side; "
                             "4x less upload on bandwidth-limited links. "
                             "Floor is 512 (BiSeNet's fixed parser space); "
                             "lower values are clamped")
    parser.add_argument("--output_res", type=int, default=None,
                        help="serve the result at this resolution (e.g. "
                             "512): the final bicubic downsample fuses into "
                             "the swap program, cutting the response bytes "
                             "(snaps to a power-of-two divisor of size)")
    parser.add_argument("--poisson", action="store_true",
                        help="final on-device Poisson composite of the "
                             "original photo outside the hair region "
                             "(reference utils/image_utils.py:58-94)")
    ns = parser.parse_args()
    main(ns, ns)
