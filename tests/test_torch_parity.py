"""Numerical parity of converted blocks vs small torch references.

For each converter in params/convert.py, build a torch module with the SAME
state_dict key layout as the reference architecture, convert it, and check
outputs match to float32 tolerance. This validates both the layout mapping
and the JAX block math without needing the real checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

from hairfastgan_tpu.models.layers import Static

torch.manual_seed(0)
ATOL = 2e-5


def randomize_bn(bn):
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
        if bn.affine:
            bn.weight.normal_(1, 0.2)
            bn.bias.normal_(0, 0.2)


def to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def from_torch(t):
    return np.asarray(t.detach().numpy())


def test_ibasic_block_parity():
    from hairfastgan_tpu.models.iresnet import ibasic_block
    from hairfastgan_tpu.params.convert import _t_ibasic

    cin, cout, s = 8, 12, 2

    class IBasic(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.prelu = nn.PReLU(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, s, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, s, bias=False), nn.BatchNorm2d(cout))

        def forward(self, x):
            out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
            return out + self.downsample(x)

    m = IBasic().eval()
    for bn in [m.bn1, m.bn2, m.bn3, m.downsample[1]]:
        randomize_bn(bn)
    with torch.no_grad():
        m.prelu.weight.normal_(0.25, 0.1)

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    p = _t_ibasic({f"x.{k}": v for k, v in sd.items()}, "x")

    x = torch.randn(2, cin, 16, 16)
    ref = from_torch(m(x)).transpose(0, 2, 3, 1)
    got = np.asarray(ibasic_block(jax.tree.map(jnp.asarray, p), to_nhwc(x), stride=s))
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_bottleneck_ir_se_parity():
    from hairfastgan_tpu.models.e4e import bottleneck_ir
    from hairfastgan_tpu.params.convert import _t_bottleneck_ir

    cin, depth, s = 8, 16, 2

    class SE(nn.Module):
        def __init__(self, c, r=4):
            super().__init__()
            self.fc1 = nn.Conv2d(c, c // r, 1, bias=False)
            self.fc2 = nn.Conv2d(c // r, c, 1, bias=False)

        def forward(self, x):
            a = TF.adaptive_avg_pool2d(x, 1)
            a = torch.sigmoid(self.fc2(TF.relu(self.fc1(a))))
            return x * a

    class BIRSE(nn.Module):
        def __init__(self):
            super().__init__()
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(cin, depth, 1, s, bias=False), nn.BatchNorm2d(depth))
            self.res_layer = nn.Sequential(
                nn.BatchNorm2d(cin), nn.Conv2d(cin, depth, 3, 1, 1, bias=False),
                nn.PReLU(depth), nn.Conv2d(depth, depth, 3, s, 1, bias=False),
                nn.BatchNorm2d(depth), SE(depth))

        def forward(self, x):
            return self.res_layer(x) + self.shortcut_layer(x)

    m = BIRSE().eval()
    randomize_bn(m.res_layer[0]); randomize_bn(m.res_layer[4])
    randomize_bn(m.shortcut_layer[1])

    sd = {f"b.{k}": v.numpy() for k, v in m.state_dict().items()}
    p = _t_bottleneck_ir(sd, "b")
    p["stride"] = Static(s)
    # SE reduction here is 4 (not 16) to keep channels tiny; converter only
    # maps weights so reduction is implicit in shapes

    x = torch.randn(2, cin, 16, 16)
    ref = from_torch(m(x)).transpose(0, 2, 3, 1)
    got = np.asarray(bottleneck_ir(jax.tree.map(jnp.asarray, p), to_nhwc(x)))
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_modulation_module_parity():
    from hairfastgan_tpu.models.encoders import modulation_module
    from hairfastgan_tpu.params.convert import _t_modulation

    rows = 6

    class Mod(nn.Module):
        def __init__(self, last=False, inp=512, middle=512):
            super().__init__()
            self.last = last
            self.fc = nn.Linear(512, 512)
            self.norm = nn.LayerNorm([rows, 512], elementwise_affine=False)
            self.gamma_function = nn.Sequential(
                nn.Linear(inp, middle), nn.LayerNorm([middle]), nn.LeakyReLU(),
                nn.Linear(middle, 512))
            self.beta_function = nn.Sequential(
                nn.Linear(inp, middle), nn.LayerNorm([middle]), nn.LeakyReLU(),
                nn.Linear(middle, 512))

        def forward(self, x, e):
            x = self.norm(self.fc(x))
            out = x * (1 + self.gamma_function(e)) + self.beta_function(e)
            return out if self.last else TF.leaky_relu(out)

    for last in (False, True):
        m = Mod(last).eval()
        sd = {f"mm.{k}": v.numpy() for k, v in m.state_dict().items()}
        p = jax.tree.map(jnp.asarray, _t_modulation(sd, "mm"))
        x = torch.randn(2, rows, 512)
        e = torch.randn(2, rows, 512)
        ref = from_torch(m(x, e))
        got = np.asarray(modulation_module(p, jnp.asarray(x.numpy()),
                                           jnp.asarray(e.numpy()), last=last))
        np.testing.assert_allclose(got, ref, atol=ATOL)


def test_ctrlhair_layernorm_parity():
    from hairfastgan_tpu.models.shape_adaptor import ctrlhair_layer_norm

    c = 12

    class LN(nn.Module):
        def __init__(self):
            super().__init__()
            self.gamma = nn.Parameter(torch.rand(c))
            self.beta = nn.Parameter(torch.randn(c) * 0.1)

        def forward(self, x):
            shape = [-1] + [1] * (x.dim() - 1)
            mean = x.view(x.size(0), -1).mean(1).view(*shape)
            std = x.view(x.size(0), -1).std(1).view(*shape)
            x = (x - mean) / (std + 1e-5)
            shape = [1, -1] + [1] * (x.dim() - 2)
            return x * self.gamma.view(*shape) + self.beta.view(*shape)

    m = LN().eval()
    p = {"gamma": jnp.asarray(m.gamma.detach().numpy()),
         "beta": jnp.asarray(m.beta.detach().numpy())}
    x = torch.randn(3, c, 8, 8)
    ref = from_torch(m(x)).transpose(0, 2, 3, 1)
    got = np.asarray(ctrlhair_layer_norm(p, to_nhwc(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_transpose_conversion():
    from hairfastgan_tpu.ops.basic import conv2d
    from hairfastgan_tpu.params.convert import t_convT

    m = nn.ConvTranspose2d(6, 10, 3, stride=2, padding=1, output_padding=1)
    sd = {f"t.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    p = jax.tree.map(jnp.asarray, t_convT(sd, "t"))
    x = torch.randn(2, 6, 9, 9)
    ref = from_torch(m(x)).transpose(0, 2, 3, 1)
    got = np.asarray(conv2d(to_nhwc(x), p["w"], p.get("b"),
                            padding=[(1, 2), (1, 2)], lhs_dilation=2))
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_spectral_norm_baking():
    from hairfastgan_tpu.ops.basic import conv2d_p
    from hairfastgan_tpu.params.convert import t_conv_sn

    conv = nn.utils.spectral_norm(nn.Conv2d(4, 8, 3, padding=1))
    conv.eval()
    x = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        for _ in range(4):
            ref_t = conv(x)  # power-iteration updates u
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    p = jax.tree.map(jnp.asarray, t_conv_sn(sd, "c"))
    got = np.asarray(conv2d_p(p, to_nhwc(x), padding=1))
    np.testing.assert_allclose(got, from_torch(ref_t).transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_gradual_style_block_parity():
    from hairfastgan_tpu.models.e4e import gradual_style_block
    from hairfastgan_tpu.params.convert import t_conv

    spatial, cin, cout = 8, 6, 16

    class GSB(nn.Module):
        def __init__(self):
            super().__init__()
            n = int(np.log2(spatial))
            mods = [nn.Conv2d(cin, cout, 3, 2, 1), nn.LeakyReLU()]
            for _ in range(n - 1):
                mods += [nn.Conv2d(cout, cout, 3, 2, 1), nn.LeakyReLU()]
            self.convs = nn.Sequential(*mods)
            self.linear = nn.Linear(cout, cout)  # stands in for EqualLinear

        def forward(self, x):
            x = self.convs(x).view(-1, cout)
            # EqualLinear with lr_mul=1: scale = 1/sqrt(in)
            return TF.linear(x, self.linear.weight / np.sqrt(cout), self.linear.bias)

    m = GSB().eval()
    sd = {f"g.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    n = int(np.log2(spatial))
    p = {
        "convs": [t_conv(sd, f"g.convs.{2 * j}") for j in range(n)],
        "linear": {"w": sd["g.linear.weight"].T.copy(), "b": sd["g.linear.bias"].copy()},
    }
    x = torch.randn(2, cin, spatial, spatial)
    ref = from_torch(m(x))
    got = np.asarray(gradual_style_block(jax.tree.map(jnp.asarray, p), to_nhwc(x)))
    np.testing.assert_allclose(got, ref, atol=ATOL)


def test_spade_parity():
    from hairfastgan_tpu.models.sean import spade_gamma_beta
    from hairfastgan_tpu.params.convert import _t_spade

    class SPADE(nn.Module):
        def __init__(self, norm_nc=12, label_nc=19, nhidden=16):
            super().__init__()
            self.mlp_shared = nn.Sequential(
                nn.Conv2d(label_nc, nhidden, 3, padding=1), nn.ReLU())
            self.mlp_gamma = nn.Conv2d(nhidden, norm_nc, 3, padding=1)
            self.mlp_beta = nn.Conv2d(nhidden, norm_nc, 3, padding=1)

        def forward(self, seg):
            a = self.mlp_shared(seg)
            return self.mlp_gamma(a), self.mlp_beta(a)

    m = SPADE().eval()
    sd = {f"s.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    p = jax.tree.map(jnp.asarray, _t_spade(sd, "s"))
    seg = torch.rand(2, 19, 16, 16)
    g_ref, b_ref = m(seg)
    g, b = spade_gamma_beta(p, to_nhwc(seg))
    np.testing.assert_allclose(np.asarray(g), from_torch(g_ref).transpose(0, 2, 3, 1), atol=ATOL)
    np.testing.assert_allclose(np.asarray(b), from_torch(b_ref).transpose(0, 2, 3, 1), atol=ATOL)


def test_zencoder_region_codes_parity():
    """Zencoder conv stack + per-region average pooling vs a torch replica
    of architecture.py:154-207 (InstanceNorm affine=False, reflect pads,
    convT with output_padding, region masked means)."""
    from hairfastgan_tpu.models.sean import zencoder_codes
    from hairfastgan_tpu.params.convert import t_conv, t_convT

    ngf = 8

    class Z(nn.Module):
        def __init__(self):
            super().__init__()
            IN = nn.InstanceNorm2d
            self.model = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(3, ngf, 3), IN(ngf), nn.LeakyReLU(0.2),
                nn.Conv2d(ngf, ngf * 2, 3, 2, 1), IN(ngf * 2), nn.LeakyReLU(0.2),
                nn.Conv2d(ngf * 2, ngf * 4, 3, 2, 1), IN(ngf * 4), nn.LeakyReLU(0.2),
                nn.ConvTranspose2d(ngf * 4, ngf * 8, 3, 2, 1, output_padding=1),
                IN(ngf * 8), nn.LeakyReLU(0.2),
                nn.ReflectionPad2d(1), nn.Conv2d(ngf * 8, 20, 3), nn.Tanh())

        def forward(self, img, seg):
            codes = self.model(img)
            seg = TF.interpolate(seg, size=codes.shape[2:], mode="nearest")
            b, f = codes.shape[0], codes.shape[1]
            s = seg.shape[1]
            out = torch.zeros((b, s, f))
            for i in range(b):
                for j in range(s):
                    area = seg.bool()[i, j].sum()
                    if area > 0:
                        out[i][j] = codes[i].masked_select(
                            seg.bool()[i, j]).reshape(f, area).mean(1)
            return out

    m = Z().eval()
    sd = {f"z.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    p = jax.tree.map(jnp.asarray, {
        "conv_in": t_conv(sd, "z.model.1"),
        "down1": t_conv(sd, "z.model.4"),
        "down2": t_conv(sd, "z.model.7"),
        "up": t_convT(sd, "z.model.10"),
        "conv_out": t_conv(sd, "z.model.14"),
    })
    img = torch.randn(2, 3, 64, 64) * 0.3
    labels = torch.randint(0, 19, (2, 64, 64))
    onehot = TF.one_hot(labels, 19).permute(0, 3, 1, 2).float()
    ref = from_torch(m(img, onehot))

    import jax as _jax
    from hairfastgan_tpu.ops.segops import one_hot_mask

    got = np.asarray(zencoder_codes(p, to_nhwc(img),
                                    one_hot_mask(jnp.asarray(labels.numpy()), 19)))
    # our codes are [B,19,C(=20 here)]; torch replica matches
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_bisenet_basicblock_and_arm_parity():
    from hairfastgan_tpu.models.bisenet import arm, basic_block
    from hairfastgan_tpu.params.convert import _t_arm, _t_basicblock

    cin, cout, s = 6, 10, 2

    class BB(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, s, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, s, bias=False), nn.BatchNorm2d(cout))

        def forward(self, x):
            r = self.bn2(self.conv2(TF.relu(self.bn1(self.conv1(x)))))
            return TF.relu(self.downsample(x) + r)

    m = BB().eval()
    for bn in (m.bn1, m.bn2, m.downsample[1]):
        randomize_bn(bn)
    sd = {f"b.{k}": v.numpy() for k, v in m.state_dict().items()}
    p = jax.tree.map(lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
                     _t_basicblock(sd, "b", s))
    x = torch.randn(2, cin, 16, 16)
    np.testing.assert_allclose(
        np.asarray(basic_block(p, to_nhwc(x))),
        from_torch(m(x)).transpose(0, 2, 3, 1), atol=ATOL)

    class ARM(nn.Module):
        def __init__(self, ci=8, co=4):
            super().__init__()
            self.conv = nn.Sequential()
            self.conv.conv = nn.Conv2d(ci, co, 3, 1, 1, bias=False)
            self.conv.bn = nn.BatchNorm2d(co)
            self.conv_atten = nn.Conv2d(co, co, 1, bias=False)
            self.bn_atten = nn.BatchNorm2d(co)

        def forward(self, x):
            f = TF.relu(self.conv.bn(self.conv.conv(x)))
            a = TF.avg_pool2d(f, f.shape[2:])
            a = torch.sigmoid(self.bn_atten(self.conv_atten(a)))
            return f * a

    ma = ARM().eval()
    randomize_bn(ma.conv.bn); randomize_bn(ma.bn_atten)
    sd = {f"a.{k}": v.numpy() for k, v in ma.state_dict().items()}
    pa = jax.tree.map(jnp.asarray, _t_arm(sd, "a"))
    xa = torch.randn(2, 8, 8, 8)
    np.testing.assert_allclose(
        np.asarray(arm(pa, to_nhwc(xa))),
        from_torch(ma(xa)).transpose(0, 2, 3, 1), atol=ATOL)
