"""Shape/finite-ness tests for the perception model zoo (CPU backend).

The frozen zoo has no reference test suite (SURVEY.md §4); these verify the
architecture contracts the pipeline relies on: output shapes, label ranges,
and batch independence. Numerical parity vs torch state_dicts is exercised
separately by the converter tests once checkpoints are available.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairfastgan_tpu.models import bisenet, clip_vit, e4e, encoders, iresnet, sean, shape_adaptor

KEY = jax.random.PRNGKey(0)


def test_iresnet_trunk_shapes():
    p = iresnet.init_trunk(KEY, depth=18)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    feats = iresnet.trunk_features(p, x)
    assert [f.shape for f in feats] == [
        (2, 32, 32, 64), (2, 16, 16, 128), (2, 8, 8, 256), (2, 4, 4, 512)]


def test_arcface_embedding():
    p = iresnet.init_arcface(KEY, depth=18)
    x = jax.random.normal(KEY, (1, 112, 112, 3))
    emb = iresnet.arcface_embed(p, x)
    assert emb.shape == (1, 512)
    assert np.isfinite(np.asarray(emb)).all()


def test_fs_encoder_contract():
    # fs_layers=(9,) is the PostProcess config: content tap after block_2,
    # 64x64x512 output for 256 input (reference Net.py:396-445)
    p = iresnet.init_fs_encoder(KEY, n_styles=18, fs_layers=(9,), depth=18)
    x = jax.random.normal(KEY, (1, 256, 256, 3))
    s, content = iresnet.fs_encode(p, x)
    assert s.shape == (1, 18, 512)
    assert content[0].shape == (1, 64, 64, 512)


def test_fs_encoder_fse_config():
    # fs_layers=(5,): tap after block_3, stride 2 -> 16x16 (FSE 143_enc)
    p = iresnet.init_fs_encoder(KEY, n_styles=18, fs_layers=(5,), depth=18)
    x = jax.random.normal(KEY, (1, 256, 256, 3))
    s, content = iresnet.fs_encode(p, x)
    assert content[0].shape == (1, 16, 16, 512)


def test_e4e_encode():
    p = e4e.init_e4e(KEY, se=True)
    x = jax.random.normal(KEY, (2, 256, 256, 3))
    w = e4e.e4e_encode(p, x)
    assert w.shape == (2, 18, 512)
    assert np.isfinite(np.asarray(w)).all()


def test_e4e_delta_structure():
    # rows 1.. equal w0 + delta_i + latent_avg; row 0 == w0 + latent_avg
    p = e4e.init_e4e(KEY, se=False)
    x = jax.random.normal(KEY, (1, 256, 256, 3))
    w_with = e4e.e4e_encode(p, x, add_latent_avg=False)
    p2 = dict(p, latent_avg=jnp.ones((18, 512)))
    w_avg = e4e.e4e_encode(p2, x, add_latent_avg=True)
    np.testing.assert_allclose(np.asarray(w_avg), np.asarray(w_with) + 1.0, rtol=1e-6)


@pytest.mark.slow  # 44 s: packed heads are a measured-slower opt-in
def test_e4e_packed_heads_match_unpacked():
    """pack_style_heads is an exact re-layout: grouped-conv chains must
    reproduce the per-head loop bit-for-bit math (both encode variants)."""
    p = e4e.init_e4e(KEY, se=False)
    q = e4e.pack_style_heads(p)
    assert "styles" not in q and len(q["styles_packed"]) == 3
    assert e4e.pack_style_heads(q) is q or "styles_packed" in e4e.pack_style_heads(q)
    x = jax.random.normal(KEY, (2, 256, 256, 3)) * 0.5
    for fn in (e4e.e4e_encode, e4e.gradual_style_encode):
        ref = np.asarray(fn(p, x))
        got = np.asarray(fn(q, x))
        np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.slow  # 33 s: packed SEAN is a measured-slower opt-in
def test_sean_packed_matches_unpacked():
    """pack_sean (stacked fc_mu + fused gamma/beta convs) is exact."""
    p = sean.init_sean_generator(KEY, ngf=16)
    q = sean.pack_sean(p)
    img = jax.random.normal(KEY, (1, 256, 256, 3)) * 0.1
    labels = jax.random.randint(KEY, (1, 256, 256), 0, 19)
    codes = sean.sean_encode(p, img, labels)
    ref = np.asarray(sean.sean_decode(p, codes, labels))
    got = np.asarray(sean.sean_decode(q, codes, labels))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # idempotent
    got2 = np.asarray(sean.sean_decode(sean.pack_sean(q), codes, labels))
    np.testing.assert_allclose(got2, got, atol=0)


def test_fse_packed_styles_match_unpacked():
    from hairfastgan_tpu.models import iresnet

    p = iresnet.init_fs_encoder(KEY, n_styles=18, fs_layers=(5,), depth=18)
    q = iresnet.pack_fs_styles(p)
    x = jax.random.normal(KEY, (2, 256, 256, 3)) * 0.5
    s_ref, c_ref = iresnet.fs_encode(p, x)
    s_got, c_got = iresnet.fs_encode(q, x)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_got[0]), np.asarray(c_ref[0]), atol=0)


def test_bisenet_labels():
    p = bisenet.init_bisenet(KEY, n_classes=19)
    img = jax.random.uniform(KEY, (1, 128, 128, 3))
    labels = bisenet.parse_to_celeba(p, img)
    assert labels.shape == (1, 128, 128)
    assert int(labels.min()) >= 0 and int(labels.max()) < 19


def test_bisenet_aux_heads():
    p = bisenet.init_bisenet(KEY, n_classes=16)
    x = bisenet.to_bisenet_input(jax.random.uniform(KEY, (1, 64, 64, 3)))
    out, o16, o32 = bisenet.bisenet_logits(p, x, aux=True)
    assert out.shape == o16.shape == o32.shape == (1, 64, 64, 16)


def test_label_permutation_is_bijection():
    perm = bisenet.FACE_PARSING_TO_CELEBA
    assert sorted(perm) == list(range(19))
    assert perm[13] == 17  # celeba hair=13 comes from raw hair=17


@pytest.mark.slow  # 50 s: SEAN encode/decode numerics are locked by the reference-import parity tests, which stay default
def test_sean_roundtrip_shapes():
    p = sean.init_sean_generator(KEY)
    img = jax.random.normal(KEY, (2, 256, 256, 3)) * 0.1
    labels = jax.random.randint(KEY, (2, 256, 256), 0, 19)
    codes = sean.sean_encode(p, img, labels)
    assert codes.shape == (2, 19, 512)
    out = sean.sean_decode(p, codes, labels)
    assert out.shape == (2, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= 1.0  # tanh output


def test_sean_mean_code_fallback():
    p = sean.init_sean_generator(KEY)
    p = dict(p, mean_codes=jnp.ones((19, 512)))
    labels = jnp.zeros((1, 256, 256), jnp.int32)
    zero_codes = jnp.zeros((1, 19, 512))
    some_codes = jnp.ones((1, 19, 512)) * 1.0
    a = sean.sean_decode(p, zero_codes, labels)
    b = sean.sean_decode(p, some_codes, labels)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shape_adaptor_roundtrip():
    p = shape_adaptor.init_shape_adaptor(KEY)
    labels = jax.random.randint(KEY, (1, 256, 256), 0, 19)
    face, hair = shape_adaptor.get_hair_face_code(p, labels)
    assert face.shape == (1, 1024) and hair.shape == (1, 16)
    new = shape_adaptor.get_new_shape(p, face, hair)
    assert new.shape == (1, 256, 256)
    assert int(new.min()) >= 0 and int(new.max()) < 19


def test_pos_embedding_table():
    g = shape_adaptor.pos_embedding(64, 4)
    assert g.shape == (64, 64, 16)
    # first octave sin of x along width: row-constant in y
    np.testing.assert_allclose(g[0, :, 0], np.sin(np.pi * np.linspace(0, 1, 64, endpoint=False)), atol=1e-6)


def test_clip_tower():
    p = clip_vit.init_clip_image_tower(KEY, width=64, layers=2, heads=2, embed_dim=32)
    img = jax.random.uniform(KEY, (2, 224, 224, 3))
    emb = clip_vit.clip_encode_image(p, clip_vit.clip_preprocess(img))
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_rotate_model_residual():
    p = encoders.init_rotate_model(KEY)
    lf = jax.random.normal(KEY, (2, 6, 512))
    lt = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 512))
    out = encoders.rotate_model(p, lf, lt)
    assert out.shape == (2, 6, 512)
    # residual scale 0.1 keeps output near input for unit-scale dt
    assert float(jnp.mean(jnp.abs(out - lf))) < float(jnp.mean(jnp.abs(lf)))


def test_blending_model():
    clip_p = clip_vit.init_clip_image_tower(KEY, width=64, layers=2, heads=2, embed_dim=512)
    p = encoders.init_blending_model(KEY, clip_params=clip_p)
    s1 = jax.random.normal(KEY, (1, 12, 512))
    s3 = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 512))
    img = jax.random.normal(KEY, (1, 256, 256, 3)) * 0.5
    out = encoders.blending_model(p, s1, s3, img, img)
    assert out.shape == (1, 12, 512)


def test_post_process_model():
    p = encoders.init_post_process_model(KEY)
    # shrink trunk for test speed: use depth-18 encoder
    p["encoder_face"] = iresnet.init_fs_encoder(KEY, n_styles=18, fs_layers=(9,), depth=18)
    src = jax.random.normal(KEY, (1, 256, 256, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3))
    s, f = encoders.post_process_model(p, src, tgt)
    assert s.shape == (1, 18, 512)
    assert f.shape == (1, 64, 64, 512)


def test_star_landmarks_tiny():
    """StackedHGNetV1 contract: soft-argmax landmarks in [-1,1] at any scale."""
    from hairfastgan_tpu.models import star

    edge_info = ((True, (0, 1, 2)), (False, (3, 4)))
    p = star.init_star(KEY, classes=(5, 2, 5), edge_info=edge_info,
                       nstack=2, nlevels=2, channels=16)
    img = jax.random.normal(KEY, (1, 64, 64, 3)) * 0.5
    lm = star.star_landmarks(p, img)
    assert lm.shape == (1, 5, 2)
    a = np.asarray(lm)
    assert np.isfinite(a).all()
    assert (a >= -1.0).all() and (a <= 1.0).all()


def test_star_e2h_matrix():
    from hairfastgan_tpu.models.star import WFLW_CLASSES, WFLW_EDGE_INFO, _e2h_matrix

    w, b = _e2h_matrix(WFLW_EDGE_INFO, WFLW_CLASSES[2], WFLW_CLASSES[1])
    assert w.shape == (98, 9)
    # points 96, 97 (pupils) belong to no edge -> bias keeps their heatmaps
    assert b[96] == 1.0 and b[97] == 1.0
    assert b[:96].sum() == 0


def test_gradual_style_encoder_variant():
    """pSp GradualStyleEncoder shares the e4e tree but stacks independent
    per-layer styles (no w0 broadcast)."""
    p = e4e.init_e4e(KEY, n_styles=18, se=False)
    x = jax.random.normal(KEY, (1, 256, 256, 3)) * 0.5
    w = e4e.gradual_style_encode(p, x, add_latent_avg=False)
    assert w.shape == (1, 18, 512)
    w_e4e = e4e.e4e_encode(p, x, add_latent_avg=False)
    # row 0 matches e4e's w0 (same styles[0](c3)); later rows differ
    np.testing.assert_allclose(np.asarray(w[:, 0]), np.asarray(w_e4e[:, 0]),
                               atol=1e-5)
    assert float(jnp.max(jnp.abs(w[:, 5] - w_e4e[:, 5]))) > 1e-4


def test_pp_train_variants():
    from hairfastgan_tpu.models.encoders import (
        init_post_process_train_model, post_process_model_train)

    src = jax.random.normal(KEY, (1, 256, 256, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3))
    mask = jnp.ones((1, 256, 256, 1))

    p = init_post_process_train_model(KEY, use_mod=True)
    p["encoder_face"] = iresnet.init_fs_encoder(KEY, n_styles=18,
                                                fs_layers=(9,), depth=18)
    # pretrain: single-image inversion path
    s, f = post_process_model_train(p, src, tgt, pretrain=True)
    assert s.shape == (1, 18, 512) and f.shape == (1, 64, 64, 512)
    # masked-F variant
    s, f = post_process_model_train(p, src, tgt, mask, use_full=False)
    assert f.shape == (1, 64, 64, 512)

    p2 = init_post_process_train_model(KEY, use_mod=False)
    p2["encoder_face"] = p["encoder_face"]
    s, f = post_process_model_train(p2, src, tgt, use_mod=False)
    assert s.shape == (1, 18, 512)


def test_region_conv_matches_broadcast_conv():
    """The reordered ACE conv (project taps onto region vectors) must equal
    conv3x3(region_broadcast(mu)) exactly."""
    from hairfastgan_tpu.models.sean import _region_conv
    from hairfastgan_tpu.ops.basic import conv2d_p
    from hairfastgan_tpu.ops.segops import one_hot_mask, region_broadcast

    k1, k2, k3 = jax.random.split(KEY, 3)
    B, H, W, K, C, O = 2, 16, 16, 19, 32, 24
    mu = jax.random.normal(k1, (B, K, C))
    labels = jax.random.randint(k2, (B, H, W), 0, K)
    seg = one_hot_mask(labels, K)
    conv_p = {"w": jax.random.normal(k3, (3, 3, C, O)) * 0.1,
              "b": jnp.ones((O,)) * 0.3}

    ref = conv2d_p(conv_p, region_broadcast(mu, seg), padding=1)
    got = _region_conv(conv_p, mu, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
