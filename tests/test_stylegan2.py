"""StyleGAN2 generator parity vs an independent torch golden.

The golden generator below is assembled from the already-tested torch golden
primitives (equal_linear, modulated conv, upfirdn) following the public
StyleGAN2 architecture; it independently reproduces the reference's wiring
(style indices, skip-RGB, noise, slicing) without sharing any code with it.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import StyleGANConfig
from hairfastgan_tpu.models import stylegan2 as sg
from tests import torch_golden as tg
from tests.test_ops_golden import nchw, nhwc

CFG = StyleGANConfig(size=32, max_channels=64)


def tree_np(p):
    return jax.tree_util.tree_map(np.asarray, p)


def torch_styled_conv(pn, x, style, noise, up=False):
    w_hwio = pn["conv"]["w"]
    if up:
        w_hwio = w_hwio[::-1, ::-1]  # undo converter pre-flip
    w_oikk = np.transpose(w_hwio, (3, 2, 0, 1)).copy()
    mod_w = pn["conv"]["modulation"]["w"].T.copy()
    mod_b = pn["conv"]["modulation"]["b"]
    s = tg.equal_linear_torch(style, torch.from_numpy(mod_w), torch.from_numpy(mod_b))
    y = tg.modulated_conv2d_torch(x, torch.from_numpy(w_oikk), s, demodulate=True,
                                  up=up)
    if noise is not None:
        y = y + float(pn["noise_weight"]) * noise
    return tg.fused_leaky_relu_torch(y, torch.from_numpy(pn["bias"]))


def torch_to_rgb(pn, x, style, skip=None):
    w_oikk = np.transpose(pn["conv"]["w"], (3, 2, 0, 1)).copy()
    mod_w = pn["conv"]["modulation"]["w"].T.copy()
    mod_b = pn["conv"]["modulation"]["b"]
    s = tg.equal_linear_torch(style, torch.from_numpy(mod_w), torch.from_numpy(mod_b))
    y = tg.modulated_conv2d_torch(x, torch.from_numpy(w_oikk), s, demodulate=False)
    y = y + torch.from_numpy(pn["bias"]).reshape(1, -1, 1, 1)
    if skip is not None:
        k2 = tg.make_kernel_torch((1, 3, 3, 1), gain=4.0)
        skip = tg.upfirdn2d_torch(skip, k2, 2, 1, (2, 1))
        y = y + skip
    return y


def torch_generator(pn, latent, noises, cfg, start_layer=0, end_layer=8,
                    layer_in=None, skip=None):
    out = None
    if start_layer == 0:
        b = latent.shape[0]
        x = torch.from_numpy(np.transpose(pn["input"], (0, 3, 1, 2))).repeat(b, 1, 1, 1)
        out = torch_styled_conv(pn["conv1"], x, latent[:, 0], noises[0])
        skip = torch_to_rgb(pn["to_rgb1"], out, latent[:, 1])
    if end_layer == 0:
        return out, skip
    for pair in range(1, cfg.log_size - 1):
        if pair < start_layer:
            continue
        if pair > end_layer:
            break
        i = 2 * pair - 1
        src = layer_in if (pair == start_layer and start_layer > 0) else out
        h = torch_styled_conv(pn["convs"][2 * pair - 2], src, latent[:, i],
                              noises[i], up=True)
        out = torch_styled_conv(pn["convs"][2 * pair - 1], h, latent[:, i + 1],
                                noises[i + 1])
        skip = torch_to_rgb(pn["to_rgbs"][pair - 1], out, latent[:, i + 2], skip)
    return out, skip


@pytest.fixture(scope="module")
def gen_setup():
    key = jax.random.PRNGKey(0)
    params = sg.init_generator_params(key, CFG)
    pn = tree_np(params)
    rng = np.random.default_rng(1)
    b = 2
    latent = rng.standard_normal((b, CFG.n_latent, CFG.style_dim), dtype=np.float32)
    noises = [rng.standard_normal((b, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1),
                                  dtype=np.float32) for i in range(CFG.num_layers)]
    return params, pn, latent, noises


def _run_both(gen_setup, **kw):
    params, pn, latent, noises = gen_setup
    jn = [jnp.asarray(n) for n in noises]
    tn = [torch.from_numpy(nchw(n)) for n in noises]
    out, rgb = sg.synthesis(params, jnp.asarray(latent), noise=jn, cfg=CFG, **kw)
    t_kw = dict(kw)
    if "layer_in" in t_kw and t_kw["layer_in"] is not None:
        t_kw["layer_in"] = torch.from_numpy(nchw(t_kw["layer_in"]))
    t_out, t_rgb = torch_generator(pn, torch.from_numpy(latent), tn, CFG, **t_kw)
    return out, rgb, t_out, t_rgb


def test_full_render(gen_setup):
    out, rgb, t_out, t_rgb = _run_both(gen_setup)
    np.testing.assert_allclose(nchw(rgb), t_rgb.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(nchw(out), t_out.numpy(), rtol=1e-3, atol=1e-3)


def test_slice_prefix(gen_setup):
    # layers 0..2 produce F-like features
    out, rgb, t_out, t_rgb = _run_both(gen_setup, end_layer=2)
    np.testing.assert_allclose(nchw(out), t_out.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(nchw(rgb), t_rgb.numpy(), rtol=1e-3, atol=1e-3)


def test_slice_resume_equals_full(gen_setup):
    """Running 0..2 then resuming 3..end with layer_in must equal 0..end."""
    params, pn, latent, noises = gen_setup
    jn = [jnp.asarray(n) for n in noises]
    lat = jnp.asarray(latent)
    full_out, full_rgb = sg.synthesis(params, lat, noise=jn, cfg=CFG)
    mid_out, _ = sg.synthesis(params, lat, noise=jn, cfg=CFG, end_layer=2)
    res_out, res_rgb = sg.synthesis(params, lat, noise=jn, cfg=CFG,
                                    start_layer=3, layer_in=mid_out)
    np.testing.assert_allclose(np.asarray(res_out), np.asarray(full_out),
                               rtol=1e-4, atol=1e-4)
    # rgb differs: resumed path has no skip accumulation from layers <3,
    # exactly like the reference (skip=None on resume)


def test_slice_inject(gen_setup):
    params, pn, latent, noises = gen_setup
    rng = np.random.default_rng(2)
    res = 2 ** (1 + 2)  # start_layer=1 consumes features at 4x4 input? no: pair1 input res 4
    feat = rng.standard_normal((latent.shape[0], 4, 4, CFG.channels(4)),
                               dtype=np.float32)
    out, rgb, t_out, t_rgb = _run_both(gen_setup, start_layer=1, end_layer=2,
                                       layer_in=jnp.asarray(feat))
    np.testing.assert_allclose(nchw(out), t_out.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(nchw(rgb), t_rgb.numpy(), rtol=1e-3, atol=1e-3)


def test_mapping_matches_torch(gen_setup):
    params, pn, latent, _ = gen_setup
    rng = np.random.default_rng(3)
    z = rng.standard_normal((4, CFG.style_dim), dtype=np.float32)
    w = sg.mapping(params, jnp.asarray(z), CFG)

    x = torch.from_numpy(z)
    x = x * torch.rsqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)
    for lp in pn["style"]:
        x = tg.equal_linear_torch(x, torch.from_numpy(lp["w"].T.copy()),
                                  torch.from_numpy(lp["b"]), lr_mul=CFG.lr_mlp,
                                  activation="fused_lrelu")
    np.testing.assert_allclose(np.asarray(w), x.numpy(), rtol=1e-4, atol=1e-4)
