"""Golden tests: JAX ops vs independently-written torch references."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from hairfastgan_tpu import ops
from hairfastgan_tpu.ops.resample import bicubic_downsample, resize
from tests import torch_golden as tg


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (2, 1)),       # blur
    (2, 1, (2, 1)),       # upsample
    (1, 2, (1, 1)),       # downsample
])
def test_upfirdn2d(rng, up, down, pad):
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    k1d = (1, 3, 3, 1)
    y = ops.upfirdn2d(jnp.asarray(x), k1d, up=up, down=down, pad=pad)
    k2d = tg.make_kernel_torch(k1d)
    ref = tg.upfirdn2d_torch(torch.from_numpy(nchw(x)), k2d, up, down, pad)
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_upfirdn2d_gain(rng):
    x = rng.standard_normal((1, 6, 6, 2), dtype=np.float32)
    k1d = (1, 3, 3, 1)
    y = ops.upfirdn2d(jnp.asarray(x), k1d, up=2, down=1, pad=(2, 1), gain=4.0)
    ref = tg.upfirdn2d_torch(torch.from_numpy(nchw(x)),
                             tg.make_kernel_torch(k1d, gain=4.0), 2, 1, (2, 1))
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu(rng):
    x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    b = rng.standard_normal(8, dtype=np.float32)
    y = ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    ref = tg.fused_leaky_relu_torch(torch.from_numpy(nchw(x)), torch.from_numpy(b))
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("activation", [None, "fused_lrelu"])
def test_equal_linear(rng, activation):
    x = rng.standard_normal((3, 16), dtype=np.float32)
    w = rng.standard_normal((32, 16), dtype=np.float32)  # torch [out, in]
    b = rng.standard_normal(32, dtype=np.float32)
    p = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
    y = ops.equal_linear(p, jnp.asarray(x), lr_mul=0.01, activation=activation)
    ref = tg.equal_linear_torch(torch.from_numpy(x), torch.from_numpy(w),
                                torch.from_numpy(b), lr_mul=0.01,
                                activation=activation)
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("demodulate,up,down", [
    (True, False, False),
    (False, False, False),
    (True, True, False),
    (True, False, True),
])
def test_modulated_conv2d(rng, demodulate, up, down):
    b, cin, cout, k, hw = 2, 8, 12, 3, 8
    x = rng.standard_normal((b, hw, hw, cin), dtype=np.float32)
    w_oikk = rng.standard_normal((cout, cin, k, k), dtype=np.float32)
    style = rng.standard_normal((b, 16), dtype=np.float32)
    mod_w = rng.standard_normal((cin, 16), dtype=np.float32)  # torch [out,in]
    mod_b = rng.standard_normal(cin, dtype=np.float32)

    w_hwio = np.transpose(w_oikk, (2, 3, 1, 0)).copy()
    if up:
        # converter stores the pre-flipped forward-form kernel for upsample
        w_hwio = np.ascontiguousarray(w_hwio[::-1, ::-1])
    p = {
        "w": jnp.asarray(w_hwio),
        "modulation": {"w": jnp.asarray(mod_w.T), "b": jnp.asarray(mod_b)},
    }
    y = ops.modulated_conv2d(p, jnp.asarray(x), jnp.asarray(style),
                             demodulate=demodulate, up=up, down=down)

    s_t = tg.equal_linear_torch(torch.from_numpy(style), torch.from_numpy(mod_w),
                                torch.from_numpy(mod_b))
    ref = tg.modulated_conv2d_torch(torch.from_numpy(nchw(x)),
                                    torch.from_numpy(w_oikk), s_t,
                                    demodulate=demodulate, up=up, down=down)
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_pulse_bicubic_downsample(rng):
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    y = bicubic_downsample(jnp.asarray(x), 4)
    ref = tg.pulse_bicubic_downsample_torch(torch.from_numpy(nchw(x)), 4)
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode,align,in_s,out_s", [
    ("nearest", False, 17, 256),
    ("nearest", False, 512, 256),
    ("bilinear", False, 16, 31),
    ("bilinear", False, 64, 32),
    ("bilinear", True, 33, 64),
    ("bicubic", False, 256, 32),
    ("bicubic", False, 16, 40),
])
def test_resize_vs_torch(rng, mode, align, in_s, out_s):
    x = rng.standard_normal((2, in_s, in_s, 3), dtype=np.float32)
    y = resize(jnp.asarray(x), (out_s, out_s), mode=mode, align_corners=align)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(nchw(x)), size=(out_s, out_s), mode=mode, **kwargs)
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_dilate_erode(rng):
    m = (rng.random((2, 32, 32, 1)) > 0.6).astype(np.float32)
    d, e = ops.dilate_erode(jnp.asarray(m), iterations=5)
    rd, re = tg.dilate_erode_torch(torch.from_numpy(nchw(m)), 5)
    np.testing.assert_array_equal(nchw(d), rd.numpy())
    np.testing.assert_array_equal(nchw(e), re.numpy())


def test_adaptive_avg_pool(rng):
    for in_s in (7, 16, 33, 128):
        x = rng.standard_normal((2, in_s, in_s, 5), dtype=np.float32)
        y = ops.adaptive_avg_pool(jnp.asarray(x), (3, 3))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(nchw(x)), (3, 3))
        np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_region_ops(rng):
    b, h, w, c, k = 2, 16, 16, 8, 19
    labels = rng.integers(0, k, (b, h, w))
    feat = rng.standard_normal((b, h, w, c), dtype=np.float32)
    oh = ops.one_hot_mask(jnp.asarray(labels), k)
    means = ops.region_mean(jnp.asarray(feat), oh)
    # torch-style loop golden
    ref = np.zeros((b, k, c), np.float32)
    for i in range(b):
        for j in range(k):
            sel = labels[i] == j
            if sel.sum() > 0:
                ref[i, j] = feat[i][sel].mean(0)
    np.testing.assert_allclose(np.asarray(means), ref, rtol=1e-4, atol=1e-5)

    back = ops.region_broadcast(means, oh)
    ref_b = ref[np.arange(b)[:, None, None], labels]
    np.testing.assert_allclose(np.asarray(back), ref_b, rtol=1e-4, atol=1e-5)


def test_batch_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 6), dtype=np.float32)
    g = rng.standard_normal(6, dtype=np.float32)
    be = rng.standard_normal(6, dtype=np.float32)
    mean = rng.standard_normal(6, dtype=np.float32)
    var = rng.random(6, dtype=np.float32) + 0.1
    p = {"gamma": jnp.asarray(g), "beta": jnp.asarray(be),
         "mean": jnp.asarray(mean), "var": jnp.asarray(var)}
    y = ops.batch_norm(p, jnp.asarray(x))
    bn = torch.nn.BatchNorm2d(6, eps=1e-5).eval()
    bn.weight.data = torch.from_numpy(g)
    bn.bias.data = torch.from_numpy(be)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    ref = bn(torch.from_numpy(nchw(x))).detach()
    np.testing.assert_allclose(nchw(y), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_modulated_conv2d_gradients(rng):
    """Gradient parity vs torch autograd through the modulated conv —
    validates the training path (the reference relies on hand-written
    double-backward CUDA autograd; ours is lax autodiff)."""
    import jax

    b, cin, cout, k, hw = 2, 4, 6, 3, 8
    x = rng.standard_normal((b, hw, hw, cin), dtype=np.float32)
    w_oikk = rng.standard_normal((cout, cin, k, k), dtype=np.float32) * 0.3
    style = rng.standard_normal((b, 8), dtype=np.float32)
    mod_w = rng.standard_normal((cin, 8), dtype=np.float32)
    mod_b = np.ones(cin, dtype=np.float32)

    p = {"w": jnp.asarray(np.transpose(w_oikk, (2, 3, 1, 0)).copy()),
         "modulation": {"w": jnp.asarray(mod_w.T), "b": jnp.asarray(mod_b)}}

    def loss_jax(p, x, s):
        y = ops.modulated_conv2d(p, x, s, demodulate=True)
        return jnp.sum(y ** 2)

    gp, gx, gs = jax.grad(loss_jax, argnums=(0, 1, 2))(
        p, jnp.asarray(x), jnp.asarray(style))

    xt = torch.from_numpy(nchw(x)).requires_grad_(True)
    wt = torch.from_numpy(w_oikk).requires_grad_(True)
    st = torch.from_numpy(style).requires_grad_(True)
    mwt = torch.from_numpy(mod_w).requires_grad_(True)
    mbt = torch.from_numpy(mod_b).requires_grad_(True)
    s_vec = tg.equal_linear_torch(st, mwt, mbt)
    ref = tg.modulated_conv2d_torch(xt, wt, s_vec, demodulate=True)
    torch.sum(ref ** 2).backward()

    np.testing.assert_allclose(nchw(gx), xt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(gp["w"]), (3, 2, 0, 1)), wt.grad.numpy(),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), st.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp["modulation"]["w"]).T,
                               mwt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_upfirdn2d_gradient(rng):
    import jax

    x = rng.standard_normal((1, 8, 8, 2), dtype=np.float32)
    k1d = (1, 3, 3, 1)

    g = jax.grad(lambda x: jnp.sum(ops.upfirdn2d(x, k1d, up=2, down=1,
                                                 pad=(2, 1)) ** 2))(jnp.asarray(x))

    xt = torch.from_numpy(nchw(x)).requires_grad_(True)
    ref = tg.upfirdn2d_torch(xt, tg.make_kernel_torch(k1d), 2, 1, (2, 1))
    torch.sum(ref ** 2).backward()
    np.testing.assert_allclose(nchw(g), xt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_modulated_conv2d_fused_blur_equivalent(rng):
    """Opt-in fused up-blur kernel must match the two-pass path exactly."""
    b, cin, cout, k, hw = 2, 6, 8, 3, 8
    x = rng.standard_normal((b, hw, hw, cin), dtype=np.float32)
    w = rng.standard_normal((k, k, cin, cout), dtype=np.float32)
    style = rng.standard_normal((b, 16), dtype=np.float32)
    p = {"w": jnp.asarray(w),
         "modulation": {"w": jnp.asarray(rng.standard_normal((16, cin),
                                                             dtype=np.float32)),
                        "b": jnp.ones(cin, jnp.float32)}}
    y0 = ops.modulated_conv2d(p, jnp.asarray(x), jnp.asarray(style), up=True)
    y1 = ops.modulated_conv2d(p, jnp.asarray(x), jnp.asarray(style), up=True,
                              fuse_blur=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
