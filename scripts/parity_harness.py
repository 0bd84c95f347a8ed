"""Full-pipeline numerical parity harness vs the PyTorch reference.

Compares EVERY stage of one hair transfer against the reference's own
`--save_all` artifact dump (the per-stage golden-tensor strategy of
SURVEY.md §4), in both noise modes. Exits nonzero on any regression, so
the day real checkpoints are mounted, one command validates the whole
BASELINE quality claim.

Reference-side dump (in the reference repo, with its checkpoints):

    python main.py --save_all --save_all_dir golden_out \
        --face_path face.png --shape_path shape.png --color_path color.png \
        --input_dir . --output_dir out
    # artifacts land in golden_out/<face_shape_color>/

Then here, with converted checkpoints:

    python scripts/parity_harness.py --golden_dir golden_out/<exp> \
        --face face.png --shape shape.png --color color.png \
        --zoo_dir pretrained_models_jax [--noise]

Golden layout consumed (reference save paths):
  W+/{face,shape,color}.npz   latent_W        (Embedding.py:112)
  FS/{name}.npz               latent_S/F      (Embedding.py:116)
  Shape/mask_{name}.png       vis masks       (Alignment.py:90-93)
  Align/face_shape_F.npz      latent_F_align  (Alignment.py:179)
  Blending/blending.npz       S_blend         (Blending.py:75)
  Final/final.npz + final.png S/F_final, img  (Blending.py:77-78)

Zero-noise mode compares exactly (tight tol); --noise re-runs with a
fresh-gaussian noise_key (the reference's StyledConv behavior) — cross-
framework RNG cannot match sample-for-sample, so image-valued stages get a
loose tolerance there while latent encoders stay tight.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).mean() / (np.abs(b).mean() + 1e-8))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def load_png01(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def decode_vis_mask(path):
    """Color PNG (CtrlHair palette) -> int labels; unknown colors -> -1."""
    from hairfastgan_tpu.utils.save_utils import PARSING_COLORS

    rgb = (load_png01(path) * 255.0 + 0.5).astype(np.uint8)
    lab = -np.ones(rgb.shape[:2], np.int32)
    for i, c in enumerate(PARSING_COLORS):
        lab[np.all(rgb == c, axis=-1)] = i
    return lab


def torch_f_to_nhwc(f):
    """Golden latent_F is NCHW [1,512,32,32] -> NHWC."""
    f = np.asarray(f)
    if f.ndim == 4:
        f = f[0]
    return np.transpose(f, (1, 2, 0))


class Report:
    def __init__(self):
        self.failures = []

    def check(self, name, err, tol):
        ok = err <= tol
        print(f"[{'OK ' if ok else 'FAIL'}] {name}: {err:.5f} (tol {tol})")
        if not ok:
            self.failures.append(name)

    def check_ge(self, name, val, floor):
        ok = val >= floor
        print(f"[{'OK ' if ok else 'FAIL'}] {name}: {val:.4f} (>= {floor})")
        if not ok:
            self.failures.append(name)


def compare_run(inter, final, g, args, mode, rep):
    """Compare one pipeline run (inter dict + final image) vs goldens."""
    loose = 5.0 if mode == "noise" else 1.0
    tol = args.tol
    # image-valued/noise-touched stages get the loose factor in noise mode;
    # pure-encoder latents (W/S/F of the inputs) never see noise
    for name in ("face", "shape", "color"):
        wz = np.load(g / "W+" / f"{name}.npz")
        fz = np.load(g / "FS" / f"{name}.npz")
        rep.check(f"{mode}:W_{name}",
                  rel_err(inter[f"W_{name}"][0], wz["latent_W"].squeeze(0)), tol)
        rep.check(f"{mode}:S_{name}",
                  rel_err(inter[f"S_{name}"][0], fz["latent_S"].squeeze(0)), tol)
        rep.check(f"{mode}:F_{name}",
                  rel_err(inter[f"F_{name}"][0],
                          torch_f_to_nhwc(fz["latent_F"])), tol)

    # masks: 256-label agreement vs the decoded vis PNGs
    for name in ("face", "shape", "color"):
        p = g / "Shape" / f"mask_{name}.png"
        if p.exists():
            ref_lab = decode_vis_mask(p)
            ours = np.asarray(inter[f"mask_{name}"][0])
            if ref_lab.shape != ours.shape:
                from hairfastgan_tpu.ops.resample import resize
                import jax.numpy as jnp

                ours = np.asarray(resize(
                    jnp.asarray(ours, jnp.float32)[None, ..., None],
                    ref_lab.shape, "nearest"))[0, ..., 0].astype(np.int32)
            rep.check_ge(f"{mode}:mask_{name} agreement",
                         float((ours == ref_lab).mean()), args.mask_floor)

    az = np.load(g / "Align" / "face_shape_F.npz")
    rep.check(f"{mode}:latent_F_align",
              rel_err(inter["latent_F_align"][0],
                      torch_f_to_nhwc(az["latent_F_align"])), tol * loose)

    bz = np.load(g / "Blending" / "blending.npz")
    rep.check(f"{mode}:S_blend",
              rel_err(inter["S_blend"][0], bz["S_blend"].squeeze(0)), tol * loose)

    fz = np.load(g / "Final" / "final.npz")
    rep.check(f"{mode}:S_final",
              rel_err(inter["S_final"][0], fz["S_final"].squeeze(0)), tol * loose)
    rep.check(f"{mode}:F_final",
              rel_err(inter["F_final"][0], torch_f_to_nhwc(fz["F_final"])),
              tol * loose)

    ref_final = load_png01(g / "Final" / "final.png")
    rep.check_ge(f"{mode}:final PSNR", psnr(final[0], ref_final),
                 args.psnr_floor if mode == "zero" else args.psnr_floor - 6.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--golden_dir", type=Path, required=True,
                    help="reference save_all_dir/<exp> directory")
    ap.add_argument("--face", type=Path, required=True)
    ap.add_argument("--shape", type=Path, required=True)
    ap.add_argument("--color", type=Path, required=True)
    ap.add_argument("--zoo_dir", type=Path, default=Path("pretrained_models_jax"))
    ap.add_argument("--tol", type=float, default=0.02,
                    help="mean relative error budget per latent stage")
    ap.add_argument("--mask_floor", type=float, default=0.98)
    ap.add_argument("--psnr_floor", type=float, default=30.0,
                    help="final-image PSNR floor (zero-noise)")
    ap.add_argument("--noise", action="store_true",
                    help="additionally run with fresh-gaussian noise "
                         "(reference StyledConv default) at loose tolerance")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.pipeline import hair_fast
    from hairfastgan_tpu.utils.images import to_image_array
    from hairfastgan_tpu.zoo import load_zoo

    cfg = HairFastConfig()
    zoo = jax.device_put(load_zoo(args.zoo_dir, cfg))
    size = cfg.stylegan.size
    imgs = tuple(jnp.asarray(to_image_array(p, size))[None]
                 for p in (args.face, args.shape, args.color))

    fn = jax.jit(lambda z, f, s, c, k: hair_fast(
        z, f, s, c, case="distinct", cfg=cfg, noise_key=k,
        return_intermediate=True))

    rep = Report()
    final, inter = fn(zoo, *imgs, None)
    compare_run(inter, np.asarray(final), args.golden_dir, args, "zero", rep)

    if args.noise:
        final, inter = fn(zoo, *imgs, jax.random.PRNGKey(3407))
        compare_run(inter, np.asarray(final), args.golden_dir, args, "noise",
                    rep)

    if rep.failures:
        raise SystemExit(f"parity failures: {rep.failures}")
    print("all stages within tolerance")


if __name__ == "__main__":
    main()
