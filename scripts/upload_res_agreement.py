"""Quantify the numerics cost of `swap(upload_res=512)` (reduced-upload serving).

The pipeline consumes the raw photo only at its fixed working spaces —
BiSeNet at 512, e4e/FSE at 256 (pipeline/embedding.py:88-97, mirroring
reference Embedding.py:56-118). upload_res=512 moves the FIRST 2x
downsample host-side (LANCZOS + uint8 quantization) instead of the
on-device bicubic FIR; everything downstream is unchanged. This script
measures what that substitution changes at the points the pipeline
actually reads:

  seg_agreement      256-label BiSeNet agreement (scaled-random weights —
                     init_zoo_fast's flat weights collapse the argmax)
  hair_iou           IoU of the hair mask (the only label the pipeline
                     thresholds on, cfg.hair_label)
  e4e_in_rmse        RMSE of the [-1,1] 256-space encoder input
  fse_in_rmse        RMSE of the FSE iterated-bilinear 256 input

Inputs are smooth random fields (low-res noise bicubic-upsampled to 1024)
rather than white noise — resampling differences on white noise are a
worst case no photo exhibits. Run on the TPU:
    python -m scripts.upload_res_agreement

Measured (v5e, n=64, smooth fields, scaled-random BiSeNet):
  with the round-5 native Keys-bicubic coercion (the real to_image_u8
  path, matching the device resampler to <=1 u8 step):
    seg_agreement 0.9901 (0.9891 non-modal), hair_iou 0.9513,
    e4e_in_rmse 0.00200, fse_in_rmse 0.00153
  PIL-LANCZOS fallback (pre-round-5 coercion):
    seg_agreement 0.9898 (0.9889 non-modal), hair_iou 0.948,
    e4e_in_rmse 0.00207, fse_in_rmse 0.00200
  The encoder-input RMSE is ~0.5 uint8 LSB — dominated by the
  quantization the uint8 upload already performs at full resolution; with
  the native filter the substitution cost is pure quantization. Contrast
  the rejected render fast paths (fastpath_agreement.py: 80.6% / 43.6%
  non-modal agreement).
upload_res stays OPT-IN (byte parity with the reference coercion breaks),
but is the recommended serving setting on bandwidth-limited links.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--upload_res", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.pipeline.embedding import fse_downscale, to_res
    from hairfastgan_tpu.utils.images import to_image_u8

    k = jax.random.PRNGKey(0)
    zoo_b = jax.device_put(bisenet.init_bisenet(k, n_classes=19))
    up = args.upload_res

    @jax.jit
    def device_path(img):
        """What the full-res program computes from the 1024 f32 image."""
        seg = bisenet.segment_256(zoo_b, to_res(img, 512))
        e4e_in = to_res(img, 256) * 2.0 - 1.0
        fse_in = fse_downscale(img * 2.0 - 1.0)
        return seg, e4e_in, fse_in

    @jax.jit
    def host_path(img_u8):
        """What the reduced-upload program computes from the host-coerced
        uint8 image (api.swap upload_res path: to_image_u8 -> device)."""
        img = img_u8.astype(jnp.float32) / 255.0
        seg = bisenet.segment_256(zoo_b, to_res(img, 512))
        e4e_in = to_res(img, 256) * 2.0 - 1.0
        fse_in = fse_downscale(img * 2.0 - 1.0)
        return seg, e4e_in, fse_in

    rng = np.random.RandomState(0)
    agree = nonmodal_agree = 0.0
    inter = union = 0.0
    e4e_se = fse_se = 0.0
    n_pix = n_nonmodal = 0
    hair = 13  # CelebA 256-space hair label (global_value_utils.py:49-52)

    for start in range(0, args.n, args.batch):
        b = min(args.batch, args.n - start)
        # smooth field: 32x32 noise -> PIL bicubic 1024
        low = rng.rand(b, 32, 32, 3).astype(np.float32)
        imgs = np.stack([
            np.asarray(Image.fromarray(
                (l * 255).astype(np.uint8)).resize((1024, 1024),
                                                   Image.BICUBIC))
            for l in low]).astype(np.float32) / 255.0
        # the api.swap(upload_res=...) host coercion — the REAL one
        # (utils/images.to_image_u8: native Keys bicubic when the loader
        # is built, PIL LANCZOS fallback), so this measures exactly what
        # serving does rather than a hand-rolled stand-in
        small = np.stack([
            to_image_u8((im * 255 + 0.5).astype(np.uint8), up)
            for im in imgs])

        seg_a, e4e_a, fse_a = jax.device_get(device_path(jnp.asarray(imgs)))
        seg_b, e4e_b, fse_b = jax.device_get(host_path(jnp.asarray(small)))

        agree += (seg_a == seg_b).sum()
        n_pix += seg_a.size
        modal = np.bincount(seg_a.ravel(), minlength=19).argmax()
        nm = seg_a != modal
        nonmodal_agree += ((seg_a == seg_b) & nm).sum()
        n_nonmodal += nm.sum()
        ha, hb = seg_a == hair, seg_b == hair
        inter += (ha & hb).sum()
        union += (ha | hb).sum()
        e4e_se += ((e4e_a - e4e_b) ** 2).sum()
        fse_se += ((fse_a - fse_b) ** 2).sum()

    print(json.dumps({
        "upload_res": up,
        "n": args.n,
        "seg_agreement": round(float(agree / n_pix), 4),
        "seg_agreement_nonmodal": round(
            float(nonmodal_agree / max(n_nonmodal, 1)), 4),
        "hair_iou": round(float(inter / max(union, 1)), 4),
        "e4e_in_rmse": round(float(np.sqrt(e4e_se / (args.n * 256 * 256 * 3))), 5),
        "fse_in_rmse": round(float(np.sqrt(fse_se / (args.n * 256 * 256 * 3))), 5),
    }))


if __name__ == "__main__":
    main()
