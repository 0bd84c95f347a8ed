"""Quantify the rotate-render fast paths' accuracy cost (VERDICT r1 #6).

The rotated render inside shape_module is consumed ONLY by the BiSeNet
re-segmentation whose 256-res labels feed the shape adaptor
(pipeline/alignment.py:69-85). Two opt-in fast paths approximate it:
  rot_seg_size=512    parse the render downsampled to 512 (reference parses
                      the full 1024 render, Alignment.py:65-67)
  rot_render_pairs=6  stop the synthesis at pair 6 (256-res partial RGB sum)

This script measures, over N random-weight renders, the 256-label agreement
and hair-mask IoU of each fast path against the exact path — the evidence
for flipping a default. Run on the TPU: python -m scripts.fastpath_agreement

Measured verdict (v5e, n=100, scaled-random weights, 16/19 classes live,
18.5% non-modal pixels): seg512 94.3% label agreement / 80.6% on non-modal
pixels / hair-IoU 0.12; pairs6 78.4% / 43.6% / 0.03. Both are below the
99% flip threshold, so BOTH fast paths remain opt-in; re-run this with real
checkpoints mounted before revisiting.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hairfastgan_tpu.config import HairFastConfig
    from hairfastgan_tpu.models import bisenet, stylegan2
    from hairfastgan_tpu.pipeline.embedding import to_res

    cfg = HairFastConfig()
    # properly-scaled random inits (init_zoo_fast's flat-0.05 numpy weights
    # collapse BiSeNet's argmax to one constant label — degenerate here)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    zoo = {"generator": jax.device_put(
               stylegan2.init_generator_params(k0, cfg.stylegan)),
           "bisenet": jax.device_put(bisenet.init_bisenet(k1, n_classes=19))}
    n_lat = cfg.stylegan.n_latent
    hair = cfg.hair_label

    def render_and_parse(gen, bis, w, end_pair, seg_size):
        _, img = stylegan2.synthesis(gen, w, end_layer=end_pair,
                                     cfg=cfg.stylegan, dtype=jnp.bfloat16)
        img01 = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        if img01.shape[1] > seg_size:
            img01 = to_res(img01, seg_size)
        return bisenet.segment_256(bis, img01)

    full_pairs = cfg.stylegan.log_size - 2
    variants = {
        "exact": (full_pairs, 1024),
        "seg512": (full_pairs, 512),
        "pairs6": (6, 1024),
        "pairs6_seg512": (6, 512),
    }
    fns = {k: jax.jit(lambda g, b, w, ep=ep, ss=ss:
                      render_and_parse(g, b, w, ep, ss))
           for k, (ep, ss) in variants.items()}

    agree = {k: [] for k in variants if k != "exact"}
    agree_nm = {k: [] for k in agree}  # agreement on non-modal pixels only
    iou = {k: [] for k in agree}
    n_classes, nonmodal_px, n_done = 0, 0, 0
    for i in range(0, args.n, args.batch):
        n_done += args.batch
        w = jax.random.normal(jax.random.PRNGKey(i),
                              (args.batch, n_lat, 512)) * 0.7
        labs = {k: np.asarray(f(zoo["generator"], zoo["bisenet"], w))
                for k, f in fns.items()}
        ref = labs["exact"]
        # guard against a degenerate parser (one class everywhere): track
        # class diversity and agreement restricted to non-modal pixels —
        # the boundary/minority structure that actually moves masks
        hist = np.bincount(ref.ravel(), minlength=19)
        nonmodal = ref != int(hist.argmax())
        n_classes = max(n_classes, int((hist > 0).sum()))
        nonmodal_px += int(nonmodal.sum())
        for k in agree:
            eq = labs[k] == ref
            agree[k].append(float(eq.mean()))
            agree_nm[k].append(float(eq[nonmodal].mean())
                               if nonmodal.any() else 1.0)
            h, hr = labs[k] == hair, ref == hair
            inter, union = (h & hr).sum(), (h | hr).sum()
            iou[k].append(float(inter) / max(float(union), 1.0))

    out = {k: {"label_agreement": round(float(np.mean(agree[k])), 5),
               "nonmodal_agreement": round(float(np.mean(agree_nm[k])), 5),
               "hair_iou": round(float(np.mean(iou[k])), 5)}
           for k in agree}
    out["_diagnostics"] = {
        "classes_present": n_classes,
        "nonmodal_px_frac": round(nonmodal_px / (n_done * 256 * 256), 5),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
