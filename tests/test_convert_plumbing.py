"""Converter plumbing tests: every params/convert.py entry point runs on a
synthetic state_dict with the reference's exact key naming and produces a
pytree the corresponding apply function accepts.

(Motivated by a real bug: a missing Static import only triggered inside
converters, which unit tests of the block translators never exercised.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairfastgan_tpu.params import convert as C

rng = np.random.RandomState(0)


def add_conv(d, n, ci, co, k, bias=False):
    d[f"{n}.weight"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.05
    if bias:
        d[f"{n}.bias"] = np.zeros(co, np.float32)


def add_bn(d, n, c, affine=True):
    if affine:
        d[f"{n}.weight"] = np.ones(c, np.float32)
        d[f"{n}.bias"] = np.zeros(c, np.float32)
    d[f"{n}.running_mean"] = np.zeros(c, np.float32)
    d[f"{n}.running_var"] = np.ones(c, np.float32)


def add_linear(d, n, ci, co):
    d[f"{n}.weight"] = rng.randn(co, ci).astype(np.float32) * 0.05
    d[f"{n}.bias"] = np.zeros(co, np.float32)


def add_prelu(d, n, c):
    d[f"{n}.weight"] = np.full(c, 0.25, np.float32)


def _ibasic(d, n, ci, co, downsample):
    add_bn(d, f"{n}.bn1", ci)
    add_conv(d, f"{n}.conv1", ci, co, 3)
    add_bn(d, f"{n}.bn2", co)
    add_prelu(d, f"{n}.prelu", co)
    add_conv(d, f"{n}.conv2", co, co, 3)
    add_bn(d, f"{n}.bn3", co)
    if downsample:
        add_conv(d, f"{n}.downsample.0", ci, co, 1)
        add_bn(d, f"{n}.downsample.1", co)


def make_fs_sd(n_styles=4):
    """fs_encoder_v2 layout (iresnet50 trunk: layers [3,4,14,3])."""
    d = {}
    add_conv(d, "conv.0", 3, 64, 3)
    add_bn(d, "conv.1", 64)
    add_prelu(d, "conv.2", 64)
    for st, (ci, co, n) in zip(
            ("block_1", "block_2", "block_3", "block_4"),
            ((64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3))):
        for i in range(n):
            _ibasic(d, f"{st}.{i}", ci if i == 0 else co, co, i == 0)
    for i in range(n_styles):
        add_linear(d, f"styles.{i}", 960 * 9, 512)
    # content_layer Sequential(BN, Conv, BN, PReLU, Conv, BN)
    add_bn(d, "content_layer.0", 256)
    add_conv(d, "content_layer.1", 256, 512, 3)
    add_bn(d, "content_layer.2", 512)
    add_prelu(d, "content_layer.3", 512)
    add_conv(d, "content_layer.4", 512, 512, 3)
    add_bn(d, "content_layer.5", 512)
    return d


def test_convert_fs_encoder_runs():
    from hairfastgan_tpu.models.iresnet import fs_encode

    p = jax.tree.map(jnp.asarray, C.convert_fs_encoder(make_fs_sd(), fs_layers=(5,)))
    s, content = fs_encode(p, jnp.zeros((1, 256, 256, 3)))
    assert s.shape == (1, 4, 512)
    assert content[0].shape == (1, 16, 16, 512)


def test_convert_e4e_runs():
    from hairfastgan_tpu.models.e4e import _blocks_50, e4e_encode

    d = {}
    add_conv(d, "input_layer.0", 3, 64, 3)
    add_bn(d, "input_layer.1", 64)
    add_prelu(d, "input_layer.2", 64)
    for i, (ci, co, s) in enumerate(_blocks_50()):
        n = f"body.{i}"
        add_bn(d, f"{n}.res_layer.0", ci)
        add_conv(d, f"{n}.res_layer.1", ci, co, 3)
        add_prelu(d, f"{n}.res_layer.2", co)
        add_conv(d, f"{n}.res_layer.3", co, co, 3)
        add_bn(d, f"{n}.res_layer.4", co)
        add_conv(d, f"{n}.res_layer.5.fc1", co, co // 16, 1)
        add_conv(d, f"{n}.res_layer.5.fc2", co // 16, co, 1)
        if ci != co:
            add_conv(d, f"{n}.shortcut_layer.0", ci, co, 1)
            add_bn(d, f"{n}.shortcut_layer.1", co)
    for i in range(18):
        spatial = 16 if i < 3 else (32 if i < 7 else 64)
        n_convs = int(np.log2(spatial))
        for j in range(n_convs):
            add_conv(d, f"styles.{i}.convs.{2 * j}", 512, 512, 3, bias=True)
        add_linear(d, f"styles.{i}.linear", 512, 512)
    add_conv(d, "latlayer1", 256, 512, 1, bias=True)
    add_conv(d, "latlayer2", 128, 512, 1, bias=True)

    p = jax.tree.map(jnp.asarray, C.convert_e4e(d))
    w = e4e_encode(p, jnp.zeros((1, 256, 256, 3)))
    assert w.shape == (1, 18, 512)


def test_convert_shape_adaptor_runs():
    from hairfastgan_tpu.models.shape_adaptor import (
        LAYER_NUM, get_face_code, get_hair_code, get_new_shape)

    d = {}
    for enc, in_ch, out_dim, vae in (("hair_encoder", 1, 16, True),
                                     ("face_encoder", 18, 1024, False)):
        cin = in_ch + 40
        for i in range(LAYER_NUM):
            cout = min(2048, 32 * 2 ** i)
            add_conv(d, f"{enc}.layers.{i}.conv", cin, cout, 4, bias=True)
            d[f"{enc}.layers.{i}.norm.gamma"] = np.ones(cout, np.float32)
            d[f"{enc}.layers.{i}.norm.beta"] = np.zeros(cout, np.float32)
            cin = cout
        add_linear(d, f"{enc}.out_layer.fc", 4 * 2048, out_dim)
        if vae:
            add_linear(d, f"{enc}.std_out_layer.fc", 4 * 2048, out_dim)
    for dec, in_dim, out_ch in (("hair_decoder", 1040, 1),
                                ("face_decoder", 1024, 18)):
        add_linear(d, f"{dec}.in_layer.fc", in_dim, 2048 * 4)
        cin = 2048
        for i in range(LAYER_NUM):
            cout = min(2048, 32 * 2 ** (LAYER_NUM - 1 - i))
            add_conv(d, f"{dec}.layers.{2 * i + 1}.conv", cin, cout, 3, bias=True)
            d[f"{dec}.layers.{2 * i + 1}.norm.gamma"] = np.ones(cout, np.float32)
            d[f"{dec}.layers.{2 * i + 1}.norm.beta"] = np.zeros(cout, np.float32)
            cin = cout
        add_conv(d, f"{dec}.out_layer.conv", cin, out_ch, 3, bias=True)

    p = jax.tree.map(jnp.asarray, C.convert_shape_adaptor(d))
    labels = jnp.zeros((1, 256, 256), jnp.int32)
    fc = get_face_code(p, labels)
    hc = get_hair_code(p, labels)
    out = get_new_shape(p, fc, hc)
    assert out.shape == (1, 256, 256)


def test_convert_sean_runs():
    from hairfastgan_tpu.models.sean import sean_decode, sean_encode

    ngf = 64
    d = {}
    zn = "Zencoder.model"
    add_conv(d, f"{zn}.1", 3, 32, 3, bias=True)
    add_conv(d, f"{zn}.4", 32, 64, 3, bias=True)
    add_conv(d, f"{zn}.7", 64, 128, 3, bias=True)
    d[f"{zn}.10.weight"] = rng.randn(128, 256, 3, 3).astype(np.float32) * 0.05
    d[f"{zn}.10.bias"] = np.zeros(256, np.float32)
    add_conv(d, f"{zn}.14", 256, 512, 3, bias=True)
    add_conv(d, "fc", 19, 16 * ngf, 3, bias=True)
    add_conv(d, "conv_img", ngf, 3, 3, bias=True)

    def ace(n, nc, use_rgb=True):
        d[f"{n}.noise_var"] = np.zeros(nc, np.float32)
        add_bn(d, f"{n}.param_free_norm", nc, affine=False)
        add_conv(d, f"{n}.Spade.mlp_shared.0", 19, 128, 3, bias=True)
        add_conv(d, f"{n}.Spade.mlp_gamma", 128, nc, 3, bias=True)
        add_conv(d, f"{n}.Spade.mlp_beta", 128, nc, 3, bias=True)
        if use_rgb:
            d[f"{n}.blending_gamma"] = np.zeros(1, np.float32)
            d[f"{n}.blending_beta"] = np.zeros(1, np.float32)
            for j in range(19):
                add_linear(d, f"{n}.fc_mu{j}", 512, 512)
            add_conv(d, f"{n}.conv_gamma", 512, nc, 3, bias=True)
            add_conv(d, f"{n}.conv_beta", 512, nc, 3, bias=True)

    def block(n, fin, fout, use_rgb=True):
        fmid = min(fin, fout)
        ace(f"{n}.ace_0", fin, use_rgb)
        add_conv(d, f"{n}.conv_0", fin, fmid, 3, bias=True)
        ace(f"{n}.ace_1", fmid, use_rgb)
        add_conv(d, f"{n}.conv_1", fmid, fout, 3, bias=True)
        if fin != fout:
            ace(f"{n}.ace_s", fin, use_rgb)
            add_conv(d, f"{n}.conv_s", fin, fout, 1)

    block("head_0", 16 * ngf, 16 * ngf)
    block("G_middle_0", 16 * ngf, 16 * ngf)
    block("G_middle_1", 16 * ngf, 16 * ngf)
    block("up_0", 16 * ngf, 8 * ngf)
    block("up_1", 8 * ngf, 4 * ngf)
    block("up_2", 4 * ngf, 2 * ngf)
    block("up_3", 2 * ngf, ngf, use_rgb=False)

    p = jax.tree.map(jnp.asarray, C.convert_sean(d))
    img = jnp.zeros((1, 256, 256, 3))
    labels = jnp.zeros((1, 256, 256), jnp.int32)
    codes = sean_encode(p, img, labels)
    out = sean_decode(p, codes, labels)
    assert out.shape == (1, 256, 256, 3)


def test_convert_glue_encoders_run():
    from hairfastgan_tpu.models.encoders import (
        blending_model, post_process_model, rotate_model)
    from hairfastgan_tpu.models.clip_vit import init_clip_image_tower

    def mod(d, n, inp=512, middle=512):
        add_linear(d, f"{n}.fc", 512, 512)
        for br in ("gamma_function", "beta_function"):
            add_linear(d, f"{n}.{br}.0", inp, middle)
            d[f"{n}.{br}.1.weight"] = np.ones(middle, np.float32)
            d[f"{n}.{br}.1.bias"] = np.zeros(middle, np.float32)
            add_linear(d, f"{n}.{br}.3", middle, 512)

    rot = {}
    for i in range(5):
        mod(rot, f"modulation_module_list.{i}")
    p = jax.tree.map(jnp.asarray, C.convert_rotate(rot))
    out = rotate_model(p, jnp.zeros((1, 6, 512)), jnp.zeros((1, 6, 512)))
    assert out.shape == (1, 6, 512)

    bl = {}
    for i in range(5):
        mod(bl, f"modulation_module_list.{i}", inp=1536, middle=1024)
    clip_p = init_clip_image_tower(jax.random.PRNGKey(0), width=64, layers=1,
                                   heads=1, embed_dim=512)
    p = jax.tree.map(jnp.asarray, C.convert_blending(bl, clip_params=clip_p))
    out = blending_model(p, jnp.zeros((1, 12, 512)), jnp.zeros((1, 12, 512)),
                         jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 12, 512)

    pp = {k if not k.startswith("X") else k: v
          for k, v in {f"encoder_face.{kk}": vv
                       for kk, vv in make_fs_sd(n_styles=18).items()}.items()}
    for i in range(5):
        mod(pp, f"to_latent_1.{i}")
        mod(pp, f"to_latent_2.{i}")
    inplanes = 1024
    for n_blk, (planes, cnt) in enumerate([(1024, 2), (768, 2), (512, 2)], 1):
        for k in range(1, cnt + 1):
            _ibasic(pp, f"to_feature.res_blocks.res_block_{n_blk}_{k}",
                    inplanes, planes, inplanes != planes)
            inplanes = planes
    p = C.convert_post_process(pp, latent_avg=np.zeros((18, 512), np.float32),
                               fs_layers=(9,))
    # fs_layers=(9,) taps block_2 (128ch); synthetic content layer is 256ch
    # (fs5 layout), so only check tree structure + modulation stacks here
    assert len(p["to_latent_1"]) == 5 and len(p["to_feature"]) == 6
    assert p["latent_avg"].shape == (18, 512)


def test_convert_star_runs():
    from hairfastgan_tpu.models import star

    d = {}

    def cb(n, ci, co, k, bn=False):
        d[f"{n}.conv.weight"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.05
        d[f"{n}.conv.bias"] = np.zeros(co, np.float32)
        if bn:
            add_bn(d, f"{n}.bn", co)

    def rb(n, ci, co):
        mid = co // 2
        add_bn(d, f"{n}.bn1", ci)
        cb(f"{n}.conv1", ci, mid, 1)
        add_bn(d, f"{n}.bn2", mid)
        cb(f"{n}.conv2", mid, mid, 3)
        add_bn(d, f"{n}.bn3", mid)
        cb(f"{n}.conv3", mid, co, 1)
        cb(f"{n}.skip_layer", ci, co, 1)  # torch creates it unconditionally

    def hg(n, lvl, ch, first):
        rb(f"{n}.up1", ch, ch)
        rb(f"{n}.low1", ch, ch)
        rb(f"{n}.low3", ch, ch)
        if lvl > 1:
            hg(f"{n}.low2", lvl - 1, ch, False)
        else:
            rb(f"{n}.low2", ch, ch)
        cb(f"{n}.coordconv", ch + (3 if first else 5), ch, 1)

    ch = 256
    cb("pre.0", 6, 64, 7, bn=True)
    rb("pre.1", 64, 128)
    rb("pre.3", 128, 128)
    rb("pre.4", 128, ch)
    for i in range(4):
        hg(f"hgs.{i}", 4, ch, i == 0)
        rb(f"features.{i}.0", ch, ch)
        cb(f"features.{i}.1", ch, ch, 1, bn=True)
        cb(f"out_heatmaps.{i}", ch, 98, 1)
        cb(f"out_pointmaps.{i}", ch, 98, 1)
        cb(f"out_edgemaps.{i}", ch, 9, 1)
        if i < 3:
            cb(f"merge_features.{i}", ch, ch, 1)
            cb(f"merge_heatmaps.{i}", 98, ch, 1)
            cb(f"merge_pointmaps.{i}", 98, ch, 1)
            cb(f"merge_edgemaps.{i}", 9, ch, 1)

    p = star.convert_star(d)
    # structure only (a full 256^2 forward is slow on CPU): 4 stacks, WFLW e2h
    assert len(p["stacks"]) == 4
    assert p["e2h_w"].shape == (98, 9)
    assert "coordconv" in p["stacks"][0]["hg"]


def test_convert_arcface_runs():
    from hairfastgan_tpu.models.iresnet import arcface_embed

    d = {}
    add_conv(d, "conv1", 3, 64, 3)
    add_bn(d, "bn1", 64)
    add_prelu(d, "prelu", 64)
    for st, (ci, co, n) in zip(("layer1", "layer2", "layer3", "layer4"),
                               ((64, 64, 2), (64, 128, 2), (128, 256, 2),
                                (256, 512, 2))):  # iresnet18 depth for speed
        for i in range(n):
            _ibasic(d, f"{st}.{i}", ci if i == 0 else co, co, i == 0)
    add_bn(d, "bn2", 512)
    add_linear(d, "fc", 512 * 7 * 7, 512)
    add_bn(d, "features", 512)

    p = jax.tree.map(jnp.asarray, C.convert_arcface(d))
    emb = arcface_embed(p, jnp.zeros((1, 112, 112, 3)))
    assert emb.shape == (1, 512)


def test_convert_irse_backbone_runs():
    from hairfastgan_tpu.losses.identity import convert_irse_backbone, irse_embed
    from hairfastgan_tpu.models.e4e import _blocks_50

    d = {}
    add_conv(d, "input_layer.0", 3, 64, 3)
    add_bn(d, "input_layer.1", 64)
    add_prelu(d, "input_layer.2", 64)
    for i, (ci, co, s) in enumerate(_blocks_50()):
        n = f"body.{i}"
        add_bn(d, f"{n}.res_layer.0", ci)
        add_conv(d, f"{n}.res_layer.1", ci, co, 3)
        add_prelu(d, f"{n}.res_layer.2", co)
        add_conv(d, f"{n}.res_layer.3", co, co, 3)
        add_bn(d, f"{n}.res_layer.4", co)
        add_conv(d, f"{n}.res_layer.5.fc1", co, co // 16, 1)
        add_conv(d, f"{n}.res_layer.5.fc2", co // 16, co, 1)
        if ci != co:
            add_conv(d, f"{n}.shortcut_layer.0", ci, co, 1)
            add_bn(d, f"{n}.shortcut_layer.1", co)
    add_bn(d, "output_layer.0", 512)
    add_linear(d, "output_layer.3", 512 * 7 * 7, 512)
    add_bn(d, "output_layer.4", 512)

    p = jax.tree.map(jnp.asarray, convert_irse_backbone(d))
    emb = irse_embed(p, jnp.zeros((1, 112, 112, 3)))
    assert emb.shape == (1, 512)


def test_convert_clip_tower_runs():
    from hairfastgan_tpu.models.clip_vit import clip_encode_image, clip_preprocess

    width, layers, heads = 64, 2, 1
    d = {"visual.conv1.weight": rng.randn(width, 3, 32, 32).astype(np.float32) * 0.05,
         "visual.class_embedding": np.zeros(width, np.float32),
         "visual.positional_embedding": np.zeros((50, width), np.float32),
         "visual.proj": rng.randn(width, 512).astype(np.float32) * 0.05}
    for n in ("ln_pre", "ln_post"):
        d[f"visual.{n}.weight"] = np.ones(width, np.float32)
        d[f"visual.{n}.bias"] = np.zeros(width, np.float32)
    for i in range(layers):
        b = f"visual.transformer.resblocks.{i}"
        d[f"{b}.attn.in_proj_weight"] = rng.randn(3 * width, width).astype(np.float32) * 0.05
        d[f"{b}.attn.in_proj_bias"] = np.zeros(3 * width, np.float32)
        add_linear(d, f"{b}.attn.out_proj", width, width)
        add_linear(d, f"{b}.mlp.c_fc", width, 4 * width)
        add_linear(d, f"{b}.mlp.c_proj", 4 * width, width)
        for ln in ("ln_1", "ln_2"):
            d[f"{b}.{ln}.weight"] = np.ones(width, np.float32)
            d[f"{b}.{ln}.bias"] = np.zeros(width, np.float32)

    p = jax.tree.map(jnp.asarray, C.convert_clip_image_tower(d))
    emb = clip_encode_image(p, clip_preprocess(jnp.zeros((1, 224, 224, 3))))
    assert emb.shape == (1, 512)


def test_convert_lpips_alex_runs():
    from hairfastgan_tpu.losses.perceptual import convert_lpips_alex, lpips

    alex = {}
    geom = [("0", 3, 64, 11), ("3", 64, 192, 5), ("6", 192, 384, 3),
            ("8", 384, 256, 3), ("10", 256, 256, 3)]
    for n, ci, co, k in geom:
        add_conv(alex, n, ci, co, k, bias=True)
    lin = {}
    for i, c in enumerate((64, 192, 384, 256, 256)):
        add_conv(lin, f"lin{i}.model.1", c, 1, 1)
    p = jax.tree.map(jnp.asarray, convert_lpips_alex(alex, lin))
    x = jnp.zeros((1, 64, 64, 3))
    assert float(lpips(p, x, x)) == pytest.approx(0.0, abs=1e-6)


def synth_inception_state_dict():
    """Synthetic torchvision inception_v3 state dict built from our own init
    shapes (shared with the fid_metric CLI plumbing test)."""
    from hairfastgan_tpu.models.inception import _BRANCH_MAP, _TV_MAP, init_inception

    shapes = jax.eval_shape(lambda: init_inception(jax.random.PRNGKey(0)))
    d = {}

    def emit(tv_name, cbn_shapes):
        w = cbn_shapes["conv"]["w"].shape  # HWIO
        if w[0] == w[1]:
            add_conv(d, f"{tv_name}.conv", w[2], w[3], w[0])
        else:
            d[f"{tv_name}.conv.weight"] = rng.randn(
                w[3], w[2], w[0], w[1]).astype(np.float32) * 0.05
        add_bn(d, f"{tv_name}.bn", w[3])

    for ours, tv in _TV_MAP.items():
        if ours.startswith("stem."):
            emit(tv, shapes["stem"][ours.split(".")[1]])
            continue
        kind = ("a" if ours.startswith("a") else "b" if ours == "b" else
                "c" if ours.startswith("c") else "d" if ours == "d" else "e")
        for k, v in _BRANCH_MAP[kind].items():
            emit(f"{tv}.{v}", shapes[ours][k])
    return d


def test_convert_inception_runs():
    from hairfastgan_tpu.models.inception import convert_inception, inception_features

    d = synth_inception_state_dict()
    p = jax.tree.map(jnp.asarray, convert_inception(d))
    f = inception_features(p, jnp.zeros((1, 96, 96, 3)))
    assert f.shape == (1, 2048)
