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
    iou = {k: [] for k in variants if k != "exact"}
    for i in range(0, args.n, args.batch):
        w = jax.random.normal(jax.random.PRNGKey(i),
                              (args.batch, n_lat, 512)) * 0.7
        labs = {k: np.asarray(f(zoo["generator"], zoo["bisenet"], w))
                for k, f in fns.items()}
        ref = labs["exact"]
        for k in agree:
            agree[k].append(float((labs[k] == ref).mean()))
            h, hr = labs[k] == hair, ref == hair
            inter, union = (h & hr).sum(), (h | hr).sum()
            iou[k].append(float(inter) / max(float(union), 1.0))

    out = {k: {"label_agreement": round(float(np.mean(agree[k])), 5),
               "hair_iou": round(float(np.mean(iou[k])), 5)}
           for k in agree}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
