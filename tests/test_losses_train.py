"""Loss-kit properties + training-step smoke tests (CPU, tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairfastgan_tpu.losses.objectives import (
    adv_d_loss, adv_g_loss, dice_loss, dilated_mask, feat_recon_loss, r1_penalty)
from hairfastgan_tpu.losses.perceptual import init_lpips_alex, lpips, lpips_scale

KEY = jax.random.PRNGKey(0)


def test_lpips_zero_on_identical():
    p = init_lpips_alex(KEY)
    x = jax.random.normal(KEY, (1, 64, 64, 3)) * 0.3
    assert float(lpips(p, x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(lpips(p, x, -x)) > 0.0


def test_lpips_scale_sums_pyramid():
    p = init_lpips_alex(KEY)
    x = jax.random.normal(KEY, (1, 256, 256, 3)) * 0.2
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3)) * 0.2
    v = float(lpips_scale(p, x, y))
    assert v > 0.0 and np.isfinite(v)


def test_dice_loss_properties():
    # confident identical predictions -> ~0; disagreement -> larger
    logits = jax.random.normal(KEY, (2, 16, 16, 16)) * 20.0
    assert float(dice_loss(logits, logits)) < 0.2
    assert float(dice_loss(logits, -logits)) > float(dice_loss(logits, logits))


def test_adv_losses():
    real = jnp.ones((4, 1)) * 3
    fake = -jnp.ones((4, 1)) * 3
    assert float(adv_d_loss(real, fake)) < 0.1  # perfect discriminator
    assert float(adv_g_loss(fake)) > 1.0  # generator fooled nothing


def test_r1_penalty_positive():
    w = jax.random.normal(KEY, (12, 1))

    def disc(params, x):
        return x.reshape(x.shape[0], -1) @ params

    x = jax.random.normal(KEY, (2, 2, 3, 2))
    v = float(r1_penalty(disc, w, x))
    # for linear D, grad = w per-pixel -> penalty = 80 * ||w||^2
    assert v == pytest.approx(80.0 * float(jnp.sum(w ** 2)), rel=1e-4)


def test_dilated_mask_range():
    m = jnp.zeros((1, 32, 32, 1)).at[:, 10:20, 10:20].set(1.0)
    sm = dilated_mask(m, 5)
    assert float(sm.max()) <= 1.0 + 1e-5
    assert float(sm[0, 15, 15, 0]) == pytest.approx(1.0, abs=1e-5)
    assert float(sm[0, 0, 0, 0]) == 0.0


def test_rotate_hair_step():
    from hairfastgan_tpu.models.encoders import init_rotate_model
    from hairfastgan_tpu.train.common import adam_with_clip, make_train_step
    from hairfastgan_tpu.train.rotate import rotate_hair_loss

    params = init_rotate_model(KEY)
    tx = adam_with_clip(1e-4)
    step = make_train_step(lambda p, *b: rotate_hair_loss(p, b), tx, donate=False)
    opt_state = tx.init(params)
    w_from = jax.random.normal(KEY, (2, 18, 512)) * 0.1
    w_to = jax.random.normal(jax.random.PRNGKey(1), (2, 18, 512)) * 0.1
    p1, opt_state, aux = step(params, opt_state, w_from, w_to)
    assert np.isfinite(float(aux["loss"]))
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p1)
    assert max(jax.tree.leaves(d)) > 0


def test_blending_train_step_tiny():
    from hairfastgan_tpu.train.blending import make_blending_train_step
    from hairfastgan_tpu.zoo import init_tiny_zoo

    zoo, cfg = init_tiny_zoo(KEY)
    frozen = {"generator": zoo["generator"], "clip": zoo["blending"]["clip"]}
    model_params = {"mods": zoo["blending"]["mods"]}
    step, tx = make_blending_train_step(frozen, cfg)
    opt_state = tx.init(model_params)

    n = cfg.stylegan.n_latent
    b = 1
    batch = (
        jax.random.normal(KEY, (b, n, 512)) * 0.1,         # color_s
        jax.random.normal(KEY, (b, n, 512)) * 0.1,         # align_s
        jax.random.normal(KEY, (b, 32, 32, 512)) * 0.1,    # align_f
        jax.random.normal(KEY, (b, 256, 256, 3)) * 0.5,    # color_i
        jax.random.normal(KEY, (b, 256, 256, 3)) * 0.5,    # face_i
        jnp.ones((b, 256, 256, 1)),                        # target_mask
        jnp.ones((b, 256, 256, 1)),                        # HM_3E
        jnp.ones((b, 256, 256, 1)),                        # HM_XE
    )
    p1, opt_state, aux = step(model_params, opt_state, *batch)
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["face_loss"]))


@pytest.fixture(scope="module")
def pp_micro_setup():
    """Micro-width PP training setup shared by the split==fused and overfit
    tests: generator 128res/128ch, 0.25x bisenet/irse trunks, B=2 batch."""
    from hairfastgan_tpu.config import HairFastConfig, StyleGANConfig
    from hairfastgan_tpu.losses.identity import init_irse_backbone
    from hairfastgan_tpu.models import bisenet, encoders, iresnet, stylegan2

    cfg = HairFastConfig(stylegan=StyleGANConfig(size=128, max_channels=128))
    n_latent = cfg.stylegan.n_latent
    c64 = cfg.stylegan.channels(64)
    keys = jax.random.split(KEY, 6)
    frozen = {
        "generator": stylegan2.init_generator_params(keys[0], cfg.stylegan),
        "bisenet16": bisenet.init_bisenet(keys[1], n_classes=16, width=0.25),
        "id_backbone": init_irse_backbone(keys[2], width=0.25),
        "lpips": init_lpips_alex(keys[3]),
    }
    params = {
        "encoder_face": iresnet.init_fs_encoder(keys[4], n_styles=n_latent,
                                                fs_layers=(9,), depth=18,
                                                width=0.25, content_ch=c64),
        "latent_avg": jnp.zeros((n_latent, 512), jnp.float32),
        "to_feature": iresnet.init_feature_iresnet(
            keys[4], blocks=((c64, 1), (c64, 1)), inplanes=2 * c64),
        "to_latent_1": [encoders.init_modulation_module(k, n_latent)
                        for k in jax.random.split(keys[4], 5)],
        "to_latent_2": [encoders.init_modulation_module(k, n_latent)
                        for k in jax.random.split(keys[5], 5)],
    }
    rng = np.random.RandomState(0)
    b = 2
    batch = (jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
             jnp.asarray(rng.randn(b, 256, 256, 3), jnp.float32) * 0.3,
             jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32),
             jnp.asarray(rng.rand(b, 256, 256, 1) > 0.5, jnp.float32))
    return cfg, frozen, params, batch


@pytest.mark.slow  # 143 s: 4-step fused==split trajectory; the split path is also dryrun phase 5
def test_pp_split_step_matches_fused(pp_micro_setup):
    """--split_compile's segmented enc_step (grad of a sum = sum of grads,
    3 programs + apply) must produce the SAME update as the fused step —
    it exists so PP training can compile through body-capped compile
    proxies (axon HTTP 413 on the fused unoptimized-HLO upload). Runs at
    the micro-width config (the grad-sum decomposition is width-agnostic;
    the real-width step is TPU-validated by tools/train_tpu_probe.py) —
    the tiny-config variant of this test cost 750 s of suite wall time.
    """
    from hairfastgan_tpu.train.pp import (
        make_pp_split_train_step, make_pp_train_steps)

    cfg, frozen, params, batch = pp_micro_setup
    b = batch[0].shape[0]
    alpha = jnp.float32(0.7)

    fused, _, _, tx, _ = make_pp_train_steps(frozen, cfg=cfg, lr=1e-3)
    split, stx = make_pp_split_train_step(frozen, cfg=cfg, lr=1e-3)

    # a 4-step TRAJECTORY, not one step: cumulative opt_state wiring bugs
    # (stale second moments, tree mixup after apply) only surface once the
    # two paths iterate — per-step losses must track within float
    # accumulation skew (measured ~3e-4 rel by step 4 at this config)
    pf, of = params, tx.init(params)
    ps, os_ = params, stx.init(params)
    for step_i in range(4):
        pf, of, auxf = fused(pf, of, *batch, alpha)
        ps, os_, auxs = split(ps, os_, *batch, alpha)
        assert float(auxs["loss"]) == pytest.approx(
            float(auxf["loss"]), rel=2e-3), (step_i, auxf["loss"], auxs["loss"])
        if step_i == 0:
            assert float(auxs["loss"]) == pytest.approx(
                float(auxf["loss"]), rel=1e-5)
            for k in ("dice", "id", "feat_rec", "lpips_face", "lpips_hair",
                      "inpaint"):
                assert float(auxs[k]) == pytest.approx(float(auxf[k]),
                                                       rel=1e-4), k
            assert float(auxs["grad_norm"]) == pytest.approx(
                float(auxf["grad_norm"]), rel=1e-4)
            # updated params agree to float accumulation order (Adam's eps
            # floor amplifies near-zero-grad ULP noise; compare well under lr)
            for a, b_ in zip(jax.tree.leaves(pf), jax.tree.leaves(ps)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                           atol=2e-4, rtol=0)
    # aux carries the renders the disc step / grids consume
    assert auxs["gen_f"].shape == auxf["gen_f"].shape
    assert auxs["gen_f_256"].shape == (b, 256, 256, 3)


def test_discriminator_shapes():
    from hairfastgan_tpu.config import StyleGANConfig
    from hairfastgan_tpu.models.stylegan2_discriminator import (
        discriminator, init_discriminator)

    cfg = StyleGANConfig(size=64, max_channels=64)
    p = init_discriminator(KEY, cfg)
    img = jax.random.normal(KEY, (4, 64, 64, 3))
    out = discriminator(p, img)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_fid_stats():
    from hairfastgan_tpu.eval.fid import FIDStats, frechet_distance

    rng = np.random.RandomState(0)
    a = rng.randn(500, 8)
    b = rng.randn(500, 8) + 2.0
    sa = FIDStats().update(a[:250]).update(a[250:])
    sb = FIDStats().update(b)
    mu_a, cov_a = sa.finalize()
    assert np.allclose(mu_a, a.mean(0))
    same = frechet_distance(*sa.finalize(), *sa.finalize())
    diff = frechet_distance(*sa.finalize(), *sb.finalize())
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 8 * 3  # ~ ||2||^2 * dims


def test_train_step_remat_equivalence():
    """remat=True (jax.checkpoint) must produce bit-comparable updates —
    same math, recomputed on backward (the HBM lever for adversarial PP
    training at 1024^2)."""
    from hairfastgan_tpu.models import encoders
    from hairfastgan_tpu.train.common import adam_with_clip, make_train_step
    from hairfastgan_tpu.train.rotate import rotate_hair_loss

    params = encoders.init_rotate_model(KEY)
    tx = adam_with_clip(1e-3)
    loss = lambda p, wf, wt: rotate_hair_loss(p, (wf, wt))
    plain = make_train_step(loss, tx, donate=False)
    remat = make_train_step(loss, tx, donate=False, remat=True)

    wf = jax.random.normal(KEY, (2, 6, 512)) * 0.3
    wt = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 512)) * 0.3
    p0, o0, a0 = plain(params, tx.init(params), wf, wt)
    p1, o1, a1 = remat(params, tx.init(params), wf, wt)
    assert float(a0["loss"]) == pytest.approx(float(a1["loss"]), rel=1e-6)
    assert float(a0["grad_norm"]) == pytest.approx(float(a1["grad_norm"]),
                                                   rel=1e-5)
    # grads are recomputation-exact to f32 ULP; Adam's m/(sqrt(v)+eps)
    # amplifies that ULP noise on near-zero grads to ~lr-scale, so params
    # compare at lr/5
    g0 = jax.grad(lambda p: loss(p, wf, wt)[0])(params)
    g1 = jax.grad(lambda p: jax.checkpoint(
        lambda q: loss(q, wf, wt)[0])(p))(params)
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6,
                                   rtol=0)
    for x, y in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4,
                                   rtol=0)


def test_fid_stats_cache_roundtrip(tmp_path):
    """FIDStats.save/load + scripts.fid_metric.real_stats npz cache: the
    second call must read the cache, not the image dir (reference
    input/fid.pkl behavior, utils/train.py:125-161)."""
    from PIL import Image

    from hairfastgan_tpu.eval.fid import FIDStats
    from scripts.fid_metric import real_stats

    rng = np.random.RandomState(0)
    s = FIDStats().update(rng.randn(100, 8))
    s.save(tmp_path / "stats.npz")
    s2 = FIDStats.load(tmp_path / "stats.npz")
    np.testing.assert_allclose(s2.finalize()[0], s.finalize()[0])
    np.testing.assert_allclose(s2.finalize()[1], s.finalize()[1])

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            str(d / f"{i}.png"))
    feat = lambda x: x.reshape(x.shape[0], -1)[:, :16].astype(np.float64)
    cache = tmp_path / "fid_cache.npz"
    mu1, cov1 = real_stats(d, feat, cache=cache, size=32)
    assert cache.exists()
    for p in d.iterdir():
        p.unlink()
    d.rmdir()  # gone: a second call can only succeed via the cache
    mu2, cov2 = real_stats(d, feat, cache=cache, size=32)
    np.testing.assert_allclose(mu2, mu1)
    np.testing.assert_allclose(cov2, cov1)


def test_fid_metric_cli_both_columns(tmp_path, monkeypatch):
    """One fid_metric invocation with --inception_ckpt emits BOTH the classic
    FID and the FID-CLIP columns (reference scripts/fid_metric.py:62-72).
    The Inception leg runs the REAL converted net from a synthetic
    torchvision state_dict; the CLIP leg and the 2 GB zoo init are stubbed
    (their real paths are covered by test_reference_parity / test_api)."""
    import torch
    from PIL import Image

    import hairfastgan_tpu.eval.fid as fid_mod
    import hairfastgan_tpu.zoo as zoo_mod
    from scripts.fid_metric import main
    from tests.test_convert_plumbing import synth_inception_state_dict

    ckpt = tmp_path / "inception_v3.pth"
    # torch tensors, like a real torchvision checkpoint (the loader uses
    # weights_only=True, which rejects raw numpy globals)
    torch.save({k: torch.from_numpy(v)
                for k, v in synth_inception_state_dict().items()}, str(ckpt))

    rng = np.random.RandomState(0)
    dirs = {}
    for name in ("real", "method_a"):
        d = tmp_path / name
        d.mkdir()
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8)).save(
                str(d / f"{i}.png"))
        dirs[name] = d

    monkeypatch.setattr(zoo_mod, "init_zoo",
                        lambda key, cfg: {"blending": {"clip": None}})
    monkeypatch.setattr(
        fid_mod, "clip_feature_fn",
        lambda params: lambda x: np.asarray(x).reshape(len(x), -1)[:, :8]
        .astype(np.float64))

    out_csv = tmp_path / "metric.csv"
    main(["--real_dir", str(dirs["real"]),
          "--method_dirs", str(dirs["method_a"]),
          "--zoo_dir", str(tmp_path / "no_zoo"),
          "--inception_ckpt", str(ckpt),
          "--fid_cache", str(tmp_path / "fid_cache.npz"),
          "--size", "96", "--batch", "4",
          "--out_csv", str(out_csv)])

    header, row = out_csv.read_text().strip().splitlines()
    assert header == "method,fid,fid_clip"
    name, fid_v, clip_v = row.split(",")
    assert name == "method_a"
    assert np.isfinite(float(fid_v)) and np.isfinite(float(clip_v))
    # per-feature-net real-stats caches, not one shared file
    assert (tmp_path / "fid_cache_fid.npz").exists()
    assert (tmp_path / "fid_cache_fid_clip.npz").exists()


def test_nan_guard():
    from hairfastgan_tpu.train.common import check_finite_loss

    check_finite_loss(jnp.asarray(1.0), 0)
    with pytest.raises(FloatingPointError):
        check_finite_loss(jnp.asarray(float("nan")), 3)
    with pytest.raises(FloatingPointError):
        check_finite_loss(jnp.asarray(float("inf")), 4)


# ---------------------------------------------------------------------------
# Overfit smoke: N steps on a FIXED tiny batch must actually reduce the loss.
# Plumbing tests (above) prove steps run and split==fused; they are blind to
# optimizer mis-wiring (stale opt_state, sign flips, frozen-vs-trained tree
# mixups) that still "runs". Loss < 0.6x initial after a few dozen steps on
# 4 fixed rows is the cheapest detector for that class of bug. Reference
# loops certified: scripts/{rotate,blending,pp}_train.py train_one_epoch
# (blending_train.py:101-124).
# ---------------------------------------------------------------------------

def _overfit(step, params, opt_state, args, n_steps):
    """Run n steps on one fixed batch; return losses (finiteness asserted)."""
    losses = []
    for _ in range(n_steps):
        params, opt_state, aux = step(params, opt_state, *args)
        l = float(aux["loss"])
        assert np.isfinite(l), f"non-finite loss at step {len(losses)}"
        assert np.isfinite(float(aux["grad_norm"]))
        losses.append(l)
    return losses


def test_rotate_overfit_smoke():
    from hairfastgan_tpu.models.encoders import init_rotate_model
    from hairfastgan_tpu.train.rotate import make_rotate_train_steps

    params = init_rotate_model(KEY)
    _, hair_step, tx = make_rotate_train_steps({}, None, lr=1e-3)
    opt_state = tx.init(params)
    w_from = jax.random.normal(KEY, (4, 18, 512)) * 0.1
    w_to = jax.random.normal(jax.random.PRNGKey(1), (4, 18, 512)) * 0.1
    losses = _overfit(hair_step, params, opt_state,
                      (w_from, w_to, None), 40)
    assert losses[-1] < 0.6 * losses[0], losses


def test_blending_overfit_smoke():
    """Micro-width frozen nets (learning dynamics, not numerics)."""
    from hairfastgan_tpu.config import HairFastConfig, StyleGANConfig
    from hairfastgan_tpu.models import clip_vit, encoders, stylegan2
    from hairfastgan_tpu.train.blending import make_blending_train_step

    cfg = HairFastConfig(stylegan=StyleGANConfig(size=64, max_channels=128))
    k0, k1, k2 = jax.random.split(KEY, 3)
    frozen = {
        "generator": stylegan2.init_generator_params(k0, cfg.stylegan),
        "clip": clip_vit.init_clip_image_tower(k1, width=64, layers=2,
                                               heads=2, embed_dim=512),
    }
    params = {"mods": [encoders.init_modulation_module(kk, 12, inp=512 * 3,
                                                       middle=1024)
                       for kk in jax.random.split(k2, 5)]}
    step, tx = make_blending_train_step(frozen, cfg, lr=3e-3)
    opt_state = tx.init(params)

    n = cfg.stylegan.n_latent
    b = 4
    k = jax.random.PRNGKey(3)
    batch = (
        jax.random.normal(k, (b, n, 512)) * 0.1,
        jax.random.normal(jax.random.fold_in(k, 1), (b, n, 512)) * 0.1,
        jax.random.normal(jax.random.fold_in(k, 2),
                          (b, 32, 32, cfg.stylegan.channels(32))) * 0.1,
        jax.random.normal(jax.random.fold_in(k, 3), (b, 256, 256, 3)) * 0.5,
        jax.random.normal(jax.random.fold_in(k, 4), (b, 256, 256, 3)) * 0.5,
        jnp.ones((b, 256, 256, 1)),
        jnp.ones((b, 256, 256, 1)),
        jnp.ones((b, 256, 256, 1)),
    )
    losses = _overfit(step, params, opt_state, batch, 30)
    assert losses[-1] < 0.6 * losses[0], losses


@pytest.mark.slow  # 75 s: rotate/blending overfit smokes stay default; pp step coverage stays via bf16/adv tests
def test_pp_overfit_smoke(pp_micro_setup):
    """PP descent on a fixed 2-row batch, micro-width trunks.

    The DEFAULT pp objective cannot monotonically descend at random init:
    feat_rec chases stop_grad(f_w(s)) — a target that moves with the
    params — and dice/lpips ride frozen random nets whose floor sits just
    under the initial loss (measured: lr 1e-4 drifts UP 3.07->4.6 over 20
    steps while the instantaneous SGD descent check passes). So the smoke
    uses the FIXED-target terms only (dice + masked id + lpips vs the
    fixed source/target images; alpha=1 removes the f_w mix) and asserts
    the measured healthy trajectory: steady descent to a plateau
    (2.9256 -> 2.889 over 10 steps on this seed). A sign-flipped update
    ascends, a stale opt_state / frozen-tree mixup flatlines, both fail
    the drop bound.
    """
    from hairfastgan_tpu.train.pp import make_pp_train_steps

    cfg, frozen, params, batch = pp_micro_setup
    weights = {"landmark": 1.0, "id": 1.0, "feat_rec": 0.0,
               "lpips_scale": 1.0, "inpaint": 0.0, "adv": 0.0}
    enc_step, _, _, tx, _ = make_pp_train_steps(frozen, weights=weights,
                                                cfg=cfg, lr=1e-3)
    losses = _overfit(enc_step, params, tx.init(params),
                      batch + (jnp.float32(1.0),), 10)
    assert losses[-1] < losses[0] - 0.02, losses      # real descent happened
    assert losses[-1] <= min(losses) + 1e-3, losses   # ...and held (no blowup)


@pytest.mark.slow  # 90 s: remat is measured-ineffective on TPU (TRAIN_r04) — equality kept as slow-tier regression
def test_pp_remat_and_donate_match_plain(pp_micro_setup):
    """remat=True (per-render jax.checkpoint, train/pp._make_synth — the
    HBM lever for full-width 1024² training, TRAIN_r04.json) must be pure
    rematerialization: identical loss, updated params within Adam's
    eps-floor ULP amplification of the recompute-order grad noise (same
    atol the split==fused test uses). donate=True must thread state across
    steps without touching the math."""
    from hairfastgan_tpu.train.pp import make_pp_train_steps

    cfg, frozen, params, batch = pp_micro_setup
    alpha = jnp.float32(0.7)
    plain, _, _, tx0, _ = make_pp_train_steps(frozen, cfg=cfg)
    remat, _, _, tx1, _ = make_pp_train_steps(frozen, cfg=cfg, remat=True)
    p0, _, a0 = plain(params, tx0.init(params), *batch, alpha)
    p1, _, a1 = remat(params, tx1.init(params), *batch, alpha)
    assert float(a0["loss"]) == float(a1["loss"])
    for x, y in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)

    dstep, _, _, txd, _ = make_pp_train_steps(frozen, cfg=cfg, donate=True)
    # donate COPIES: donating the module-scoped fixture's own buffers deletes
    # them for every later test in the module (this exact aliasing made
    # test_pp_bf16_compute_dtype fail suite-order-dependently, SUITE_TIME r4)
    pd = jax.tree.map(jnp.array, params)
    od = txd.init(pd)
    for _ in range(2):
        pd, od, ad = dstep(pd, od, *batch, alpha)
    assert np.isfinite(float(ad["loss"]))


def test_pp_adversarial_d_steps(pp_micro_setup):
    """Default-tier adversarial wiring coverage (the end-to-end CLI
    adversarial epochs are slow-tier): disc_step must move the
    discriminator against (real, fake) pairs and r1_step must return the
    positive lazy-R1 penalty — the D side of pp_train.py:121-183."""
    from hairfastgan_tpu.models.stylegan2_discriminator import (
        init_discriminator)
    from hairfastgan_tpu.train.pp import make_pp_train_steps

    cfg, _, _, _ = pp_micro_setup
    _, disc_step, r1_step, _, d_tx = make_pp_train_steps(
        {}, cfg=cfg, use_adv=True)
    disc = init_discriminator(jax.random.PRNGKey(2), cfg.stylegan)
    size = cfg.stylegan.size
    rng = np.random.RandomState(5)
    real = jnp.asarray(rng.randn(2, size, size, 3), jnp.float32) * 0.3
    fake = jnp.asarray(rng.randn(2, size, size, 3), jnp.float32) * 0.3
    d1, _, aux = disc_step(disc, d_tx.init(disc), real, fake)
    assert np.isfinite(float(aux["loss"]))
    moved = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree.leaves(disc), jax.tree.leaves(d1))]
    assert max(moved) > 0
    assert float(r1_step(disc, real)) > 0.0


def test_pp_bf16_compute_dtype(pp_micro_setup):
    """compute_dtype=bf16 (train/pp.pp_loss) is standard TPU mixed
    precision: activations/frozen nets ride bf16, Adam master params stay
    f32, and the loss tracks the f32 step to bf16 accumulation error. This
    is the full-width memory lever — f32 B=2 OOMs a 16 GB v5e and remat
    can't help because XLA already remats (TRAIN_r04.json)."""
    from hairfastgan_tpu.train.pp import make_pp_train_steps

    cfg, frozen, params, batch = pp_micro_setup
    alpha = jnp.float32(0.7)
    plain, _, _, tx0, _ = make_pp_train_steps(frozen, cfg=cfg)
    mixed, _, _, tx1, _ = make_pp_train_steps(frozen, cfg=cfg,
                                              compute_dtype=jnp.bfloat16)
    p0, _, a0 = plain(params, tx0.init(params), *batch, alpha)
    p1, _, a1 = mixed(params, tx1.init(params), *batch, alpha)

    l0, l1 = float(a0["loss"]), float(a1["loss"])
    assert np.isfinite(l1)
    assert abs(l0 - l1) < 0.05 * abs(l0) + 0.05, (l0, l1)
    # master params stay f32 and the step actually moved them the same way
    moved = 0.0
    n_agree = n_total = 0.0
    for x, y, z in zip(jax.tree.leaves(params), jax.tree.leaves(p1),
                       jax.tree.leaves(p0)):
        if jnp.issubdtype(y.dtype, jnp.floating):
            assert y.dtype == jnp.float32, y.dtype
        moved += float(jnp.abs(y - x).sum())
        # Adam's sign-ish first step: bf16 grads agree with f32 grads on
        # direction for the overwhelming majority of coordinates. Aggregate
        # globally — tiny near-zero-grad leaves (biases) legitimately flip
        # under bf16 rounding and would fail a per-leaf bar.
        n_agree += float(jnp.sum(jnp.sign(y - x) == jnp.sign(z - x)))
        n_total += y.size
    assert moved > 0.0
    assert n_agree / n_total > 0.8, n_agree / n_total

    # --split_compile x --bf16: the segmented step applies the same mixed-
    # precision regime per segment and tracks the fused bf16 loss
    from hairfastgan_tpu.train.pp import make_pp_split_train_step
    split, stx = make_pp_split_train_step(frozen, cfg=cfg,
                                          compute_dtype=jnp.bfloat16)
    ps, _, axs = split(params, stx.init(params), *batch, alpha)
    ls = float(axs["loss"])
    assert np.isfinite(ls)
    assert abs(ls - l1) < 0.05 * abs(l1) + 0.05, (ls, l1)
    for leaf in jax.tree.leaves(ps):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
