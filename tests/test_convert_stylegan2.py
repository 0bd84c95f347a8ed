"""convert_stylegan2 layout test against a synthetic rosinality state_dict.

Builds a state_dict with the reference's exact key naming/shapes
(models/stylegan2/model.py:368-465 module tree) for a tiny config, converts
it, and checks the pytree drops into our synthesis with the expected
structure — including the transposed-conv spatial flip for up-convs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.config import StyleGANConfig
from hairfastgan_tpu.models import stylegan2
from hairfastgan_tpu.params.convert import convert_stylegan2


def synth_state_dict(cfg: StyleGANConfig, rng):
    """Rosinality g_ema key layout for a tiny config."""
    sd = {}
    # style.0 is PixelNorm (no params); 1..8 EqualLinear
    for i in range(1, cfg.n_mlp + 1):
        sd[f"style.{i}.weight"] = rng.randn(cfg.style_dim, cfg.style_dim).astype(np.float32)
        sd[f"style.{i}.bias"] = rng.randn(cfg.style_dim).astype(np.float32)
    ch4 = cfg.channels(4)
    sd["input.input"] = rng.randn(1, ch4, 4, 4).astype(np.float32)

    def modconv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.randn(1, cout, cin, k, k).astype(np.float32)
        sd[f"{name}.modulation.weight"] = rng.randn(cin, cfg.style_dim).astype(np.float32)
        sd[f"{name}.modulation.bias"] = np.ones(cin, np.float32)

    modconv("conv1.conv", ch4, ch4, 3)
    sd["conv1.noise.weight"] = np.zeros((1,), np.float32)
    sd["conv1.activate.bias"] = rng.randn(ch4).astype(np.float32)
    modconv("to_rgb1.conv", ch4, 3, 1)
    sd["to_rgb1.bias"] = rng.randn(1, 3, 1, 1).astype(np.float32)

    in_ch = ch4
    ci = 0
    for i in range(3, cfg.log_size + 1):
        out_ch = cfg.channels(2 ** i)
        modconv(f"convs.{ci}.conv", in_ch, out_ch, 3)
        sd[f"convs.{ci}.noise.weight"] = np.zeros((1,), np.float32)
        sd[f"convs.{ci}.activate.bias"] = rng.randn(out_ch).astype(np.float32)
        modconv(f"convs.{ci + 1}.conv", out_ch, out_ch, 3)
        sd[f"convs.{ci + 1}.noise.weight"] = np.zeros((1,), np.float32)
        sd[f"convs.{ci + 1}.activate.bias"] = rng.randn(out_ch).astype(np.float32)
        modconv(f"to_rgbs.{i - 3}.conv", out_ch, 3, 1)
        sd[f"to_rgbs.{i - 3}.bias"] = rng.randn(1, 3, 1, 1).astype(np.float32)
        in_ch = out_ch
        ci += 2
    return sd


def test_convert_and_run():
    cfg = StyleGANConfig(size=32, max_channels=32)
    rng = np.random.RandomState(0)
    sd = synth_state_dict(cfg, rng)
    params = jax.tree.map(jnp.asarray, convert_stylegan2(sd))

    # structural checks
    assert len(params["style"]) == cfg.n_mlp
    assert params["input"].shape == (1, 4, 4, cfg.channels(4))
    assert len(params["convs"]) == (cfg.log_size - 2) * 2
    assert len(params["to_rgbs"]) == cfg.log_size - 2
    # up-conv weights were spatially flipped: verify against the raw tensor
    raw = sd["convs.0.conv.weight"][0]  # [out, in, k, k]
    got = np.asarray(params["convs"][0]["conv"]["w"])  # HWIO
    np.testing.assert_allclose(got[0, 0, :, :],
                               raw[:, :, 2, 2].T)  # flipped corner
    # non-up conv: plain transpose
    raw1 = sd["convs.1.conv.weight"][0]
    got1 = np.asarray(params["convs"][1]["conv"]["w"])
    np.testing.assert_allclose(got1[0, 0, :, :], raw1[:, :, 0, 0].T)

    # runs through synthesis end to end
    lat = jnp.zeros((1, cfg.n_latent, cfg.style_dim))
    img = stylegan2.generate(params, lat, cfg=cfg)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
