"""Tests: Poisson blending, P-space PCA, save_utils, orbax checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_poisson_blend_flat_regions():
    from hairfastgan_tpu.ops.poisson import poisson_blend_multigrid

    dst = jnp.ones((1, 64, 64, 3)) * 0.8
    src = jnp.ones((1, 64, 64, 3)) * 0.2
    mask = jnp.zeros((1, 64, 64, 1)).at[:, 20:44, 20:44].set(1.0)
    out = poisson_blend_multigrid(src, dst, mask, n_iters=100, levels=4)
    # flat source gradients -> harmonic fill of the boundary value
    assert float(out[0, 32, 32, 0]) == pytest.approx(0.8, abs=0.02)
    assert float(out[0, 0, 0, 0]) == pytest.approx(0.8, abs=1e-6)


def test_poisson_preserves_src_laplacian():
    """The defining property: lap(out) == lap(src) strictly inside the mask."""
    from hairfastgan_tpu.ops.poisson import _lap, poisson_blend

    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, 64), jnp.linspace(-1, 1, 64),
                          indexing="ij")
    bump = jnp.exp(-(xx ** 2 + yy ** 2) * 12.0)
    src = jnp.tile(bump[None, :, :, None], (1, 1, 1, 3)) * 0.5
    dst = jnp.ones((1, 64, 64, 3)) * 0.5
    mask = jnp.zeros((1, 64, 64, 1)).at[:, 16:48, 16:48].set(1.0)
    out = poisson_blend(src, dst, mask, n_iters=3000)
    lap_out = np.asarray(_lap(out))[0, 20:44, 20:44]
    lap_src = np.asarray(_lap(src))[0, 20:44, 20:44]
    np.testing.assert_allclose(lap_out, lap_src, atol=2e-3)


def test_poisson_composite_reduces_seam_energy():
    """The --poisson composite's purpose: cloning src into dst inside the
    mask must leave a far smaller seam across the mask boundary than a
    naive paste (reference poisson_image_blending, image_utils.py:58-94)."""
    from hairfastgan_tpu.ops.poisson import poisson_blend_multigrid

    rng = np.random.RandomState(0)
    dst = jnp.asarray(rng.rand(1, 64, 64, 3) * 0.2 + 0.7, jnp.float32)
    src = jnp.asarray(rng.rand(1, 64, 64, 3) * 0.2 + 0.1, jnp.float32)
    mask = jnp.zeros((1, 64, 64, 1)).at[:, 16:48, 16:48].set(1.0)

    def seam_energy(img):
        # squared jumps across the mask boundary (vertical + horizontal)
        dy = (img[:, 1:] - img[:, :-1]) ** 2 * jnp.abs(mask[:, 1:] - mask[:, :-1])
        dx = (img[:, :, 1:] - img[:, :, :-1]) ** 2 * jnp.abs(mask[:, :, 1:] - mask[:, :, :-1])
        return float(jnp.sum(dy) + jnp.sum(dx))

    naive = dst * (1 - mask) + src * mask
    blended = poisson_blend_multigrid(src, dst, mask, n_iters=150, levels=3)
    assert seam_energy(blended) < 0.05 * seam_energy(naive)


def test_init_zoo_fast_bn_stats():
    """init_zoo_fast must keep batchnorm running stats at their init
    semantics: a random negative "var" NaNs every BN consumer (rsqrt)."""
    from hairfastgan_tpu.config import HairFastConfig, StyleGANConfig
    from hairfastgan_tpu.zoo import init_zoo_fast

    cfg = HairFastConfig(stylegan=StyleGANConfig(size=128, max_channels=128))
    zoo = init_zoo_fast(0, cfg)

    import jax

    checked = [0]

    def assert_stats(path, leaf):
        key = path[-1].key if hasattr(path[-1], "key") else None
        if key == "var":
            assert (np.asarray(leaf) == 1.0).all(), path
            checked[0] += 1
        elif key == "mean":
            assert (np.asarray(leaf) == 0.0).all(), path

    jax.tree_util.tree_map_with_path(assert_stats, zoo)
    assert checked[0] > 50  # iresnet/e4e/bisenet BN stacks are all covered


def test_pspace_pca_and_pnorm():
    from hairfastgan_tpu.config import StyleGANConfig
    from hairfastgan_tpu.models import stylegan2
    from hairfastgan_tpu.pspace import build_pca_model, p_norm_loss

    cfg = StyleGANConfig(size=32, max_channels=32)
    params = stylegan2.init_generator_params(KEY, cfg)
    model = build_pca_model(params, None, n_samples=4096, batch=1024, cfg=cfg)
    assert model["X_comp"].shape == (512, 512)
    pca = {k: jnp.asarray(v) for k, v in model.items() if k != "X_var_ratio"}

    w = stylegan2.mapping(params, jax.random.normal(KEY, (4, 512)), cfg)
    lat = stylegan2.latent_to_wplus(w, cfg.n_latent)
    v = float(p_norm_loss(pca, lat))
    assert np.isfinite(v) and v > 0
    # whitened in-distribution samples have ~unit per-component variance
    assert 0.05 < v < 20.0


def test_save_utils(tmp_path):
    from hairfastgan_tpu.utils.save_utils import (
        save_gen_image, save_latents, save_vis_mask)

    img = jnp.zeros((1, 16, 16, 3))
    save_gen_image(tmp_path, "Stage", "a.png", img)
    save_vis_mask(tmp_path, "Stage", "m.png", jnp.ones((1, 16, 16), jnp.int32) * 13)
    save_latents(tmp_path, "Stage", "l.npz", W=jnp.ones((1, 18, 512)))
    assert (tmp_path / "Stage" / "a.png").exists()
    assert (tmp_path / "Stage" / "m.png").exists()
    z = np.load(tmp_path / "Stage" / "l.npz")
    assert z["W"].shape == (1, 18, 512)


def test_orbax_roundtrip(tmp_path):
    from hairfastgan_tpu.params.checkpoint import restore_pytree, save_pytree

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": [jnp.ones((4,))],
            "c": {"d": jnp.zeros((2, 2))}}
    save_pytree(tmp_path / "ckpt", tree)
    back = restore_pytree(tmp_path / "ckpt")
    jax.tree.map(lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                         np.asarray(y)),
                 tree, back)


def test_train_state_roundtrip(tmp_path):
    import optax

    from hairfastgan_tpu.params.checkpoint import (
        restore_train_state, save_train_state)

    params = {"w": jnp.ones((3, 3)), "clip": {"frozen": jnp.zeros((2,))}}
    tx = optax.adam(1e-4)
    opt = tx.init({"w": params["w"]})
    save_train_state(tmp_path / "ts", params, opt, step=7)
    st = restore_train_state(tmp_path / "ts")
    assert int(st["step"]) == 7
    assert "clip" not in st["params"]  # frozen tower stripped like reference
    np.testing.assert_allclose(np.asarray(st["params"]["w"]), 1.0)


def test_inception_channel_progression():
    """InceptionV3 feature extractor: block output channels match the
    canonical torchvision progression and the FID head is 2048-d."""
    from hairfastgan_tpu.models.inception import (
        _inception_a, _inception_b, _inception_c, _inception_d, _inception_e,
        init_inception, inception_features)

    p = init_inception(KEY)
    x = jax.random.uniform(KEY, (1, 96, 96, 3))
    f = inception_features(p, x)
    assert f.shape == (1, 2048)

    a_out = _inception_a(p["a1"], jax.random.normal(KEY, (1, 8, 8, 192)))
    assert a_out.shape[-1] == 256  # 64+64+96+32
    b_out = _inception_b(p["b"], jax.random.normal(KEY, (1, 9, 9, 288)))
    assert b_out.shape[-1] == 768  # 384+96+288
    c_out = _inception_c(p["c1"], jax.random.normal(KEY, (1, 8, 8, 768)))
    assert c_out.shape[-1] == 768  # 192*4
    d_out = _inception_d(p["d"], jax.random.normal(KEY, (1, 9, 9, 768)))
    assert d_out.shape[-1] == 1280  # 320+192+768
    e_out = _inception_e(p["e1"], jax.random.normal(KEY, (1, 8, 8, 1280)))
    assert e_out.shape[-1] == 2048  # 320+768+768+192


def test_equal_replacer_semantics():
    """Mirrors reference utils/image_utils.py:15-24: value-equal arrays
    collapse to ONE object; the strided-sample short circuit must not
    change the verdict for equal, near-equal, or distinct images."""
    import numpy as np

    from hairfastgan_tpu.utils.images import equal_replacer

    rng = np.random.RandomState(0)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = a.copy()                      # value-equal -> same object
    c = rng.rand(64, 64, 3).astype(np.float32)
    d = a.copy()
    d[5, 5, 0] += 1.0                 # differs OFF the sample grid
    out = equal_replacer([a, b, c, d])
    assert out[1] is out[0]
    assert out[2] is not out[0]
    assert out[3] is not out[0]      # full compare catches the off-grid diff

    ua = (a * 255).astype(np.uint8)
    ub = ua.copy()
    uc = ua.copy()
    uc[63, 63, 2] ^= 1               # 1-LSB uint8 diff off the sample grid
    uout = equal_replacer([ua, ub, uc])
    assert uout[1] is uout[0]
    assert uout[2] is not uout[0]


def test_to_image_u8_passthrough():
    """Right-shaped uint8 input must pass through copy-free (serving hot
    path); everything else converts as before."""
    import numpy as np

    from hairfastgan_tpu.utils.images import to_image_u8

    u8 = np.random.RandomState(1).randint(0, 255, (32, 32, 3), np.uint8)
    assert to_image_u8(u8, size=32) is u8
    f = u8.astype(np.float32) / 255.0
    conv = to_image_u8(f, size=32)
    assert conv.dtype == np.uint8
    np.testing.assert_array_equal(conv, u8)
