"""End-to-end pipeline smoke tests at tiny resolution (CPU).

The reference has no e2e test; per SURVEY.md §4 we design our own: a 256^2
generator zoo run through every pipeline stage and all four static dedup
cases, checking shapes, value ranges and finiteness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairfastgan_tpu.pipeline import align_images, blend_images, embed_images, hair_fast, swap_cases
from hairfastgan_tpu.zoo import init_tiny_zoo

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def tiny():
    zoo, cfg = init_tiny_zoo(KEY)
    return zoo, cfg


@pytest.fixture(scope="module")
def images():
    k1, k2, k3 = jax.random.split(KEY, 3)
    size = 128
    return (jax.random.uniform(k1, (1, size, size, 3)),
            jax.random.uniform(k2, (1, size, size, 3)),
            jax.random.uniform(k3, (1, size, size, 3)))


def test_embed_contract(tiny, images):
    zoo, cfg = tiny
    face, _, _ = images
    emb = embed_images(zoo, face, mix=False, cfg=cfg)
    n_latent = cfg.stylegan.n_latent
    assert emb["W"].shape == (1, n_latent, 512)
    assert emb["S"].shape == (1, n_latent, 512)
    assert emb["F"].shape == (1, 32, 32, 512)
    # the 256/512 working spaces are absolute, independent of generator size
    assert emb["mask"].shape == (1, 256, 256)
    assert emb["image_256"].shape == (1, 256, 256, 3)
    for v in emb.values():
        assert np.isfinite(np.asarray(v, dtype=np.float32)).all()


def test_embed_mixing_changes_F_only_in_hair(tiny, images):
    zoo, cfg = tiny
    face, _, _ = images
    e0 = embed_images(zoo, face, mix=False, cfg=cfg)
    e1 = embed_images(zoo, face, mix=True, cfg=cfg)
    # mixing is a lerp toward F_W inside (bicubic-resized) hair mask only
    assert e0["F"].shape == e1["F"].shape
    np.testing.assert_allclose(np.asarray(e0["S"]), np.asarray(e1["S"]))


def test_align_same_fast_path(tiny, images):
    zoo, cfg = tiny
    face, _, _ = images
    emb = embed_images(zoo, face, mix=False, cfg=cfg)
    out = align_images(zoo, emb, emb, same=True, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out["latent_F_align"]),
                               np.asarray(emb["F"]))
    assert out["HM_X"].shape == (1, 256, 256, 1)


# 'distinct' exercises every stage; 'same' covers the reconstruction fast
# paths. The two remaining cases are structural subsets of these (kept out of
# CI to bound CPU compile time; the multichip dryrun covers 'distinct' too).
@pytest.mark.parametrize("case", ["same", "distinct"])
def test_hair_fast_cases(tiny, images, case):
    zoo, cfg = tiny
    face, shape, color = images
    if case == "same":
        shape = color = face
    out = hair_fast(zoo, face, shape, color, case=case, cfg=cfg)
    assert out.shape == (1, 128, 128, 3)
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.0


@pytest.mark.slow  # 36 s: pair_shape_modules is a measured-slower opt-in
def test_shape_module_pair_matches_two_calls(tiny, images):
    """Batched dual shape module == two sequential shape_module calls (exact:
    render/segment/adaptor are batch-independent; the face path is shared)."""
    from hairfastgan_tpu.pipeline.alignment import shape_module, shape_module_pair

    zoo, cfg = tiny
    face, shape, color = images
    both = jnp.concatenate([face, shape, color], axis=0)
    emb = embed_images(zoo, both, mix=True, cfg=cfg)
    e_f = {k: v[0:1] for k, v in emb.items()}
    e_s = {k: v[1:2] for k, v in emb.items()}
    e_c = {k: v[2:3] for k, v in emb.items()}

    sm_s, sm_c = shape_module_pair(zoo, e_f, e_s, e_c, cfg=cfg)
    ref_s = shape_module(zoo, e_f, e_s, same=False, cfg=cfg)
    ref_c = shape_module(zoo, e_f, e_c, same=False, cfg=cfg)
    for got, ref in ((sm_s, ref_s), (sm_c, ref_c)):
        # identical inputs -> bitwise-equal input-derived masks
        for k in ("hair_mask1", "hair_mask2"):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))
        # argmax label maps: B=2 vs B=1 conv scheduling may flip float
        # near-ties at isolated pixels — require >=99.9% agreement
        for k in ("target_mask", "rot_mask", "HM_X"):
            a = np.asarray(got[k], dtype=np.float32)
            b = np.asarray(ref[k], dtype=np.float32)
            assert (a == b).mean() > 0.999, k


@pytest.mark.slow  # 107 s: pack_zoo is a measured-slower opt-in (CLAUDE.md); equality kept as slow-tier regression
def test_hair_fast_packed_zoo_matches(tiny, images):
    """pack_zoo (inference weight re-layout) leaves the composed pipeline
    output numerically unchanged (tolerance covers matmul-order drift)."""
    from hairfastgan_tpu.zoo import pack_zoo

    zoo, cfg = tiny
    face, shape, color = images
    ref = hair_fast(zoo, face, shape, color, case="distinct", cfg=cfg)
    got = hair_fast(pack_zoo(zoo), face, shape, color, case="distinct", cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)
    assert float(jnp.abs(got - ref).mean()) < 2e-4


def test_swap_cases_dispatch(images):
    face, shape, color = images
    assert swap_cases(face, shape, color) == "distinct"
    assert swap_cases(face, face, face) == "same"
    assert swap_cases(face, shape, shape) == "shape_eq_color"
    assert swap_cases(face, face, color) == "face_eq_shape"


def test_embed_batched_independent(tiny, images):
    """Batch rows don't interact (BN uses running stats, no cross-batch ops)."""
    zoo, cfg = tiny
    face, shape, _ = images
    both = jnp.concatenate([face, shape], axis=0)
    e2 = embed_images(zoo, both, mix=False, cfg=cfg)
    e1 = embed_images(zoo, face, mix=False, cfg=cfg)
    np.testing.assert_allclose(np.asarray(e2["S"][:1]), np.asarray(e1["S"]),
                               atol=2e-4)


def test_face_eq_color_case(tiny, images):
    zoo, cfg = tiny
    face, shape, _ = images
    out = hair_fast(zoo, face, shape, face, case="face_eq_color", cfg=cfg)
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_swap_cases_face_eq_color(images):
    face, shape, _ = images
    assert swap_cases(face, shape, face) == "face_eq_color"


@pytest.mark.slow  # 73 s: per-generator row-ABI tests in test_train_cli stay default
def test_datagen_rows_feed_trainers(tiny, images):
    """Dataset generators -> training losses, chained: the blending row
    drives blending_loss, the pp row drives pp_loss — catches any
    generator-output / trainer-input contract drift (the reference's
    *_gen.py -> *_train.py handoff)."""
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.losses.perceptual import init_lpips_alex
    from hairfastgan_tpu.models import bisenet
    from hairfastgan_tpu.train.blending import blending_loss
    from hairfastgan_tpu.train.datagen import (
        generate_blending_sample, generate_pp_sample, generate_rotate_pair)
    from hairfastgan_tpu.train.pp import pp_loss

    zoo, cfg = tiny
    face, shape, color = images

    brow = generate_blending_sample(zoo, face, shape, color, cfg)
    f_ch = cfg.stylegan.channels(32)
    assert brow["align_f"].shape == (1, 32, 32, f_ch)
    assert brow["color_s"].shape == (1, cfg.stylegan.n_latent, 512)
    assert brow["face_i"].shape == (1, 256, 256, 3)
    for k, v in brow.items():
        assert np.isfinite(np.asarray(v)).all(), k

    batch = (brow["color_s"], brow["align_s"], brow["align_f"],
             brow["color_i"], brow["face_i"], brow["target_mask"],
             brow["HM_3E"], brow["HM_XE"])
    frozen_b = {"generator": zoo["generator"],
                "clip": zoo["blending"]["clip"]}
    loss, aux = blending_loss(zoo["blending"], frozen_b, batch, cfg)
    assert np.isfinite(float(loss))

    prow = generate_pp_sample(zoo, face, shape, color, cfg)
    assert prow["target"].shape == (1, 256, 256, 3)
    assert prow["source_full"].shape == face.shape
    for k, v in prow.items():
        assert np.isfinite(np.asarray(v)).all(), k

    frozen_p = {"generator": zoo["generator"],
                "bisenet16": bisenet.init_bisenet(KEY, n_classes=16),
                "id_backbone": init_irse_backbone(KEY),
                "lpips": init_lpips_alex(KEY)}
    # rows are stored already normed ([-1,1]); scripts/train_pp.py feeds
    # BATCH_KEYS verbatim into pp_loss
    losses, _ = pp_loss(zoo["post_process"], frozen_p,
                        (prow["source"], prow["target"],
                         prow["target_mask"], prow["HT_E"]), cfg=cfg)
    assert np.isfinite(float(losses))

    rrow = generate_rotate_pair(zoo, face, shape, cfg)
    assert rrow["W_from"].shape == (1, cfg.stylegan.n_latent, 512)
    assert rrow["I_from"].shape == (1, 256, 256, 3)
    for k, v in rrow.items():
        assert np.isfinite(np.asarray(v)).all(), k
