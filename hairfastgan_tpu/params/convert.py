"""PyTorch checkpoint -> JAX pytree converters (the "weights ABI").

One function per checkpoint family of the reference inventory
(SURVEY.md §2.12). All converters take a flat `dict[str, np.ndarray]`
state_dict (load with `load_torch_state_dict`) and return parameter pytrees
matching the `init_*` functions of the corresponding model module.

Layout rules (ops/basic.py conventions):
  * Linear  torch [out, in]        -> w [in, out] (transpose)
  * Conv2d  torch OIHW             -> w HWIO (transpose 2,3,1,0)
  * ConvTranspose2d torch [in,out,kh,kw] -> forward-conv HWIO with both
    spatial axes flipped (see ops/basic.conv_transpose2d)
  * BatchNorm -> {gamma, beta, mean, var}
  * spectral_norm convs are baked: W = W_orig / sigma(u, W, v)
  * NCHW constants (StyleGAN input, latent maps) -> NHWC
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

import numpy as np

from hairfastgan_tpu.models.layers import Static

Array = np.ndarray
SD = Dict[str, Array]


def load_torch_state_dict(path: str, key: str = None) -> SD:
    """torch.load -> numpy dict; imported lazily so jax-only envs work."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None and key in ckpt:
        ckpt = ckpt[key]
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


# -- primitive translators ---------------------------------------------------

def t_linear(sd: SD, name: str) -> dict:
    p = {"w": sd[f"{name}.weight"].T.copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def t_conv(sd: SD, name: str) -> dict:
    p = {"w": sd[f"{name}.weight"].transpose(2, 3, 1, 0).copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def t_conv_sn(sd: SD, name: str) -> dict:
    """Bake spectral norm: W/sigma with sigma = u^T (W_mat v)."""
    if f"{name}.weight_orig" not in sd:
        return t_conv(sd, name)
    w = sd[f"{name}.weight_orig"]
    u = sd[f"{name}.weight_u"]
    v = sd[f"{name}.weight_v"]
    sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
    p = {"w": (w / sigma).transpose(2, 3, 1, 0).copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def t_convT(sd: SD, name: str) -> dict:
    """ConvTranspose2d [in,out,kh,kw] -> flipped HWIO forward kernel."""
    w = sd[f"{name}.weight"][:, :, ::-1, ::-1]
    p = {"w": w.transpose(2, 3, 0, 1).copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def t_bn(sd: SD, name: str) -> dict:
    out = {
        "mean": sd[f"{name}.running_mean"].copy(),
        "var": sd[f"{name}.running_var"].copy(),
    }
    if f"{name}.weight" in sd:
        out["gamma"] = sd[f"{name}.weight"].copy()
        out["beta"] = sd[f"{name}.bias"].copy()
    else:  # affine=False
        out["gamma"] = np.ones_like(out["mean"])
        out["beta"] = np.zeros_like(out["mean"])
    return out


def t_prelu(sd: SD, name: str) -> dict:
    return {"w": sd[f"{name}.weight"].copy()}


def t_ln(sd: SD, name: str, gamma="weight", beta="bias") -> dict:
    return {"gamma": sd[f"{name}.{gamma}"].copy(), "beta": sd[f"{name}.{beta}"].copy()}


def _subkeys(sd: SD, prefix: str) -> SD:
    pl = len(prefix) + 1
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def _n_children(sd: SD, prefix: str) -> int:
    idx = set()
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            idx.add(int(m.group(1)))
    return max(idx) + 1 if idx else 0


# ---------------------------------------------------------------------------
# StyleGAN2 (ffhq.pt 'g_ema', reference models/stylegan2/model.py:368-465)
# ---------------------------------------------------------------------------

def _t_modconv(sd: SD, name: str, up: bool = False) -> dict:
    w = sd[f"{name}.weight"][0]  # [out, in, k, k]
    if up:
        # reference up path: w.transpose(1,2) -> conv_transpose2d
        # (model.py:243-255); forward form flips spatial, HWIO with I=in
        w = w[:, :, ::-1, ::-1]
    hwio = w.transpose(2, 3, 1, 0).copy()
    return {
        "w": hwio,
        "modulation": t_linear(sd, f"{name}.modulation"),
    }


def convert_stylegan2(sd: SD) -> dict:
    """'g_ema' state_dict -> init_generator_params-shaped pytree."""
    n_style = _n_children(sd, "style") or 9
    params = {
        "style": [t_linear(sd, f"style.{i}") for i in range(1, n_style)],
        "input": sd["input.input"].transpose(0, 2, 3, 1).copy(),
        "conv1": {
            "conv": _t_modconv(sd, "conv1.conv"),
            "noise_weight": sd["conv1.noise.weight"].reshape(()).copy(),
            "bias": sd["conv1.activate.bias"].copy(),
        },
        "to_rgb1": {
            "conv": _t_modconv(sd, "to_rgb1.conv"),
            "bias": sd["to_rgb1.bias"].reshape(-1).copy(),
        },
        "convs": [],
        "to_rgbs": [],
    }
    n_convs = _n_children(sd, "convs")
    for i in range(n_convs):
        params["convs"].append({
            "conv": _t_modconv(sd, f"convs.{i}.conv", up=(i % 2 == 0)),
            "noise_weight": sd[f"convs.{i}.noise.weight"].reshape(()).copy(),
            "bias": sd[f"convs.{i}.activate.bias"].copy(),
        })
    for i in range(n_convs // 2):
        params["to_rgbs"].append({
            "conv": _t_modconv(sd, f"to_rgbs.{i}.conv"),
            "bias": sd[f"to_rgbs.{i}.bias"].reshape(-1).copy(),
        })
    return params


def convert_discriminator(sd: SD, size: int = 1024) -> dict:
    """rosinality Discriminator state_dict (model.py:667-725) ->
    models/stylegan2_discriminator.init_discriminator-shaped tree.

    Layout: convs.0 = ConvLayer(3, ch, 1) [EqualConv2d, FusedLeakyReLU];
    convs.1..N = ResBlocks whose conv2/skip are Sequential(Blur, EqualConv2d,
    [FusedLeakyReLU]) — the Blur 'kernel' buffers are fixed (1,3,3,1) and
    regenerated by the apply fn, so only weights/biases map.
    """
    import math

    log_size = int(math.log2(size))
    p = {
        "conv_in": {"conv": {"w": sd["convs.0.0.weight"].transpose(2, 3, 1, 0).copy()},
                    "bias": sd["convs.0.1.bias"].copy()},
        "blocks": [],
        "final_conv": {"conv": {"w": sd["final_conv.0.weight"].transpose(2, 3, 1, 0).copy()},
                       "bias": sd["final_conv.1.bias"].copy()},
        "final_linear1": t_linear(sd, "final_linear.0"),
        "final_linear2": t_linear(sd, "final_linear.1"),
    }
    for j in range(1, log_size - 1):
        n = f"convs.{j}"
        p["blocks"].append({
            "conv1": {"conv": {"w": sd[f"{n}.conv1.0.weight"].transpose(2, 3, 1, 0).copy()},
                      "bias": sd[f"{n}.conv1.1.bias"].copy()},
            "conv2": {"conv": {"w": sd[f"{n}.conv2.1.weight"].transpose(2, 3, 1, 0).copy()},
                      "bias": sd[f"{n}.conv2.2.bias"].copy()},
            "skip": {"conv": {"w": sd[f"{n}.skip.1.weight"].transpose(2, 3, 1, 0).copy()}},
        })
    return p


# ---------------------------------------------------------------------------
# insightface IResNet trunk (ArcFace / FSE / PostProcess encoders)
# ---------------------------------------------------------------------------

def _t_ibasic(sd: SD, name: str) -> dict:
    p = {
        "bn1": t_bn(sd, f"{name}.bn1"),
        "conv1": t_conv(sd, f"{name}.conv1"),
        "bn2": t_bn(sd, f"{name}.bn2"),
        "prelu": t_prelu(sd, f"{name}.prelu"),
        "conv2": t_conv(sd, f"{name}.conv2"),
        "bn3": t_bn(sd, f"{name}.bn3"),
    }
    if f"{name}.downsample.0.weight" in sd:
        p["downsample"] = {
            "conv": t_conv(sd, f"{name}.downsample.0"),
            "bn": t_bn(sd, f"{name}.downsample.1"),
        }
    return p


def _t_trunk(sd: SD, stem: Sequence[str] = ("conv1", "bn1", "prelu"),
             stages: Sequence[str] = ("layer1", "layer2", "layer3", "layer4")) -> dict:
    p = {
        "conv1": t_conv(sd, stem[0]),
        "bn1": t_bn(sd, stem[1]),
        "prelu": t_prelu(sd, stem[2]),
        "stages": [],
    }
    for st in stages:
        n = _n_children(sd, st)
        p["stages"].append([_t_ibasic(sd, f"{st}.{i}") for i in range(n)])
    return p


def convert_arcface(sd: SD) -> dict:
    return {
        "trunk": _t_trunk(sd),
        "bn2": t_bn(sd, "bn2"),
        "fc": t_linear(sd, "fc"),
        "features_bn": t_bn(sd, "features"),
    }


def _t_content_layer(sd: SD, name: str) -> dict:
    # Sequential(BN, Conv, BN, PReLU, Conv, BN) (Net.py:352-360)
    stride_w = sd[f"{name}.4.weight"]
    return {
        "bn0": t_bn(sd, f"{name}.0"),
        "conv1": t_conv(sd, f"{name}.1"),
        "bn1": t_bn(sd, f"{name}.2"),
        "prelu": t_prelu(sd, f"{name}.3"),
        "conv2": t_conv(sd, f"{name}.4"),
        "bn2": t_bn(sd, f"{name}.5"),
        "stride": None,  # caller fills a Static from the fs table
    }


def convert_fs_encoder(sd: SD, fs_layers: Sequence[int] = (5,)) -> dict:
    """fs_encoder_v2 / FeatureEncoder(Mult) state_dict."""
    from hairfastgan_tpu.models.iresnet import FS_KERNELS, FS_STRIDES  # lazy

    shift = 0 if max(fs_layers) <= 7 else 2
    p = {
        "trunk": _t_trunk(sd, stem=("conv.0", "conv.1", "conv.2"),
                          stages=("block_1", "block_2", "block_3", "block_4")),
        "styles": [t_linear(sd, f"styles.{i}")
                   for i in range(_n_children(sd, "styles"))],
        "content": [],
        "fs_layers": Static(tuple(fs_layers)),
    }
    multi = any(k.startswith("content_layer.0.0") for k in sd)
    for i, l in enumerate(fs_layers):
        name = f"content_layer.{i}" if multi else "content_layer"
        cl = _t_content_layer(sd, name)
        cl["stride"] = Static(FS_STRIDES[l - shift])
        p["content"].append(cl)
    return p


def convert_feature_iresnet(sd: SD, prefix: str = "res_blocks") -> list:
    """FeatureiResnet ModuleDict res_block_{n}_{k} (Encoders.py:35-57)."""
    names = sorted(
        {m.group(0) for k in sd
         for m in [re.match(rf"{prefix}\.res_block_(\d+)_(\d+)", k)] if m},
        key=lambda s: tuple(int(x) for x in re.findall(r"\d+", s.split("res_block_")[1])),
    )
    out = []
    for n in names:
        b = _t_ibasic(sd, n)
        if f"{n}.downsample.0.weight" in sd:
            b["downsample"] = {"conv": t_conv(sd, f"{n}.downsample.0"),
                               "bn": t_bn(sd, f"{n}.downsample.1")}
        out.append(b)
    return out


# ---------------------------------------------------------------------------
# e4e (Encoder4Editing inside pSp checkpoint, keys 'encoder.*' + latent_avg)
# ---------------------------------------------------------------------------

def _t_bottleneck_ir(sd: SD, name: str) -> dict:
    p = {
        "bn_in": t_bn(sd, f"{name}.res_layer.0"),
        "conv1": t_conv(sd, f"{name}.res_layer.1"),
        "prelu": t_prelu(sd, f"{name}.res_layer.2"),
        "conv2": t_conv(sd, f"{name}.res_layer.3"),
        "bn_out": t_bn(sd, f"{name}.res_layer.4"),
        "stride": None,  # caller fills a Static from the 50-layer spec
    }
    if f"{name}.res_layer.5.fc1.weight" in sd:
        p["se"] = {"fc1": t_conv(sd, f"{name}.res_layer.5.fc1"),
                   "fc2": t_conv(sd, f"{name}.res_layer.5.fc2")}
    if f"{name}.shortcut_layer.0.weight" in sd:
        p["shortcut"] = {"conv": t_conv(sd, f"{name}.shortcut_layer.0"),
                         "bn": t_bn(sd, f"{name}.shortcut_layer.1")}
    return p


def convert_e4e(sd: SD, latent_avg: Array = None) -> dict:
    from hairfastgan_tpu.models.e4e import _blocks_50  # lazy

    spec = _blocks_50()
    body = []
    for i, (_, _, stride) in enumerate(spec):
        b = _t_bottleneck_ir(sd, f"body.{i}")
        b["stride"] = Static(stride)
        body.append(b)
    styles = []
    for i in range(_n_children(sd, "styles")):
        # convs Sequential alternates Conv2d (even idx) and LeakyReLU; the
        # trailing LeakyReLU has no params so max index = 2*(n-1): ceil-div
        n_convs = (_n_children(sd, f"styles.{i}.convs") + 1) // 2
        styles.append({
            "convs": [t_conv(sd, f"styles.{i}.convs.{2 * j}") for j in range(n_convs)],
            "linear": {"w": sd[f"styles.{i}.linear.weight"].T.copy(),
                       "b": sd[f"styles.{i}.linear.bias"].copy()},
        })
    return {
        "backbone": {
            "input": {"conv": t_conv(sd, "input_layer.0"),
                      "bn": t_bn(sd, "input_layer.1"),
                      "prelu": t_prelu(sd, "input_layer.2")},
            "body": body,
        },
        "styles": styles,
        "latlayer1": t_conv(sd, "latlayer1"),
        "latlayer2": t_conv(sd, "latlayer2"),
        "latent_avg": latent_avg if latent_avg is not None
        else np.zeros((len(styles), 512), np.float32),
    }


# ---------------------------------------------------------------------------
# BiSeNet (face_parsing_79999_iter.pth / seg.pth)
# ---------------------------------------------------------------------------

def _t_basicblock(sd: SD, name: str, stride: int) -> dict:
    p = {
        "conv1": {"conv": t_conv(sd, f"{name}.conv1"), "bn": t_bn(sd, f"{name}.bn1")},
        "conv2": {"conv": t_conv(sd, f"{name}.conv2"), "bn": t_bn(sd, f"{name}.bn2")},
        "stride": Static(stride),
    }
    if f"{name}.downsample.0.weight" in sd:
        p["downsample"] = {"conv": t_conv(sd, f"{name}.downsample.0"),
                           "bn": t_bn(sd, f"{name}.downsample.1")}
    return p


def _t_convbnrelu(sd: SD, name: str) -> dict:
    return {"conv": t_conv(sd, f"{name}.conv"), "bn": t_bn(sd, f"{name}.bn")}


def _t_arm(sd: SD, name: str) -> dict:
    return {
        "conv": _t_convbnrelu(sd, f"{name}.conv"),
        "atten": t_conv(sd, f"{name}.conv_atten"),
        "bn_atten": t_bn(sd, f"{name}.bn_atten"),
    }


def _t_bise_head(sd: SD, name: str) -> dict:
    return {"conv": _t_convbnrelu(sd, f"{name}.conv"),
            "out": t_conv(sd, f"{name}.conv_out")}


def convert_bisenet(sd: SD, n_classes: int = 19) -> dict:
    resnet = {"conv1": {"conv": t_conv(sd, "cp.resnet.conv1"),
                        "bn": t_bn(sd, "cp.resnet.bn1")}}
    for li, stride in zip(range(1, 5), (1, 2, 2, 2)):
        resnet[f"layer{li}"] = [
            _t_basicblock(sd, f"cp.resnet.layer{li}.0", stride),
            _t_basicblock(sd, f"cp.resnet.layer{li}.1", 1),
        ]
    return {
        "resnet": resnet,
        "arm16": _t_arm(sd, "cp.arm16"),
        "arm32": _t_arm(sd, "cp.arm32"),
        "conv_head32": _t_convbnrelu(sd, "cp.conv_head32"),
        "conv_head16": _t_convbnrelu(sd, "cp.conv_head16"),
        "conv_avg": _t_convbnrelu(sd, "cp.conv_avg"),
        "ffm": {
            "convblk": _t_convbnrelu(sd, "ffm.convblk"),
            "conv1": t_conv(sd, "ffm.conv1"),
            "conv2": t_conv(sd, "ffm.conv2"),
        },
        "head": _t_bise_head(sd, "conv_out"),
        "head16": _t_bise_head(sd, "conv_out16"),
        "head32": _t_bise_head(sd, "conv_out32"),
        "n_classes": Static(n_classes),
    }


# ---------------------------------------------------------------------------
# SEAN generator (netG of CelebA-HQ_pretrained)
# ---------------------------------------------------------------------------

def _t_spade(sd: SD, name: str) -> dict:
    return {
        "shared": t_conv(sd, f"{name}.mlp_shared.0"),
        "gamma": t_conv(sd, f"{name}.mlp_gamma"),
        "beta": t_conv(sd, f"{name}.mlp_beta"),
    }


def _t_ace(sd: SD, name: str, use_rgb: bool) -> dict:
    p = {
        "spade": _t_spade(sd, f"{name}.Spade"),
        "bn": t_bn(sd, f"{name}.param_free_norm"),
        "noise_var": sd[f"{name}.noise_var"].copy(),
    }
    if use_rgb:
        p["blend_gamma"] = sd[f"{name}.blending_gamma"].reshape(()).copy()
        p["blend_beta"] = sd[f"{name}.blending_beta"].reshape(()).copy()
        p["fc_mu"] = [t_linear(sd, f"{name}.fc_mu{j}") for j in range(19)]
        p["conv_gamma"] = t_conv(sd, f"{name}.conv_gamma")
        p["conv_beta"] = t_conv(sd, f"{name}.conv_beta")
    return p


def _t_spade_block(sd: SD, name: str, use_rgb: bool = True) -> dict:
    p = {
        "ace0": _t_ace(sd, f"{name}.ace_0", use_rgb),
        "conv0": t_conv_sn(sd, f"{name}.conv_0"),
        "ace1": _t_ace(sd, f"{name}.ace_1", use_rgb),
        "conv1": t_conv_sn(sd, f"{name}.conv_1"),
    }
    if any(k.startswith(f"{name}.conv_s.") for k in sd):
        p["ace_s"] = _t_ace(sd, f"{name}.ace_s", use_rgb)
        p["conv_s"] = t_conv_sn(sd, f"{name}.conv_s")
    return p


def convert_sean(sd: SD, mean_codes: Array = None) -> dict:
    # Zencoder Sequential indices (architecture.py:158-178):
    # 1 conv_in, 4 down1, 7 down2, 10 convT up, 14 conv_out
    zname = "Zencoder.model"
    return {
        "zencoder": {
            "conv_in": t_conv(sd, f"{zname}.1"),
            "down1": t_conv(sd, f"{zname}.4"),
            "down2": t_conv(sd, f"{zname}.7"),
            "up": t_convT(sd, f"{zname}.10"),
            "conv_out": t_conv(sd, f"{zname}.14"),
        },
        "fc": t_conv(sd, "fc"),
        "head0": _t_spade_block(sd, "head_0"),
        "mid0": _t_spade_block(sd, "G_middle_0"),
        "mid1": _t_spade_block(sd, "G_middle_1"),
        "up0": _t_spade_block(sd, "up_0"),
        "up1": _t_spade_block(sd, "up_1"),
        "up2": _t_spade_block(sd, "up_2"),
        "up3": _t_spade_block(sd, "up_3", use_rgb=False),
        "conv_img": t_conv(sd, "conv_img"),
        "mean_codes": mean_codes if mean_codes is not None
        else np.zeros((19, 512), np.float32),
    }


def load_sean_mean_codes(style_dir: str) -> Array:
    """styles_test/mean_style_code/median/<j>/ACE.npy -> [19,512]."""
    import os

    codes = np.zeros((19, 512), np.float32)
    for j in range(19):
        path = os.path.join(style_dir, str(j), "ACE.npy")
        if os.path.exists(path):
            codes[j] = np.load(path)
    return codes


# ---------------------------------------------------------------------------
# Shape adaptor (mask_generator.pth)
# ---------------------------------------------------------------------------

def _t_mask_encoder(sd: SD, name: str, vae: bool) -> dict:
    n = _n_children(sd, f"{name}.layers")
    p = {
        "layers": [{
            "conv": t_conv(sd, f"{name}.layers.{i}.conv"),
            "ln": t_ln(sd, f"{name}.layers.{i}.norm", "gamma", "beta"),
        } for i in range(n)],
        "out": t_linear(sd, f"{name}.out_layer.fc"),
    }
    if vae and f"{name}.std_out_layer.fc.weight" in sd:
        p["std_out"] = t_linear(sd, f"{name}.std_out_layer.fc")
    return p


def _t_mask_decoder(sd: SD, name: str) -> dict:
    from hairfastgan_tpu.models.shape_adaptor import INPUT_SIZE, LAYER_NUM  # lazy

    layers = []
    for i in range(LAYER_NUM):
        # Sequential alternates Upsample (no params) and Conv2dBlock
        idx = 2 * i + 1
        layers.append({
            "conv": t_conv(sd, f"{name}.layers.{idx}.conv"),
            "ln": t_ln(sd, f"{name}.layers.{idx}.norm", "gamma", "beta"),
        })
    return {
        "in": t_linear(sd, f"{name}.in_layer.fc"),
        "layers": layers,
        "out": t_conv(sd, f"{name}.out_layer.conv"),
    }


def convert_shape_adaptor(sd: SD) -> dict:
    return {
        "hair_encoder": _t_mask_encoder(sd, "hair_encoder", vae=True),
        "face_encoder": _t_mask_encoder(sd, "face_encoder", vae=False),
        "hair_decoder": _t_mask_decoder(sd, "hair_decoder"),
        "face_decoder": _t_mask_decoder(sd, "face_decoder"),
    }


# ---------------------------------------------------------------------------
# CLIP ViT-B/32 image tower (visual.* of the clip pip checkpoint)
# ---------------------------------------------------------------------------

def convert_clip_image_tower(sd: SD, prefix: str = "visual") -> dict:
    g = lambda k: sd[f"{prefix}.{k}"].astype(np.float32)
    n_blocks = _n_children(sd, f"{prefix}.transformer.resblocks")
    blocks = []
    for i in range(n_blocks):
        b = f"{prefix}.transformer.resblocks.{i}"
        blocks.append({
            "ln1": {"gamma": sd[f"{b}.ln_1.weight"].astype(np.float32),
                    "beta": sd[f"{b}.ln_1.bias"].astype(np.float32)},
            "attn": {
                "in_proj": {"w": sd[f"{b}.attn.in_proj_weight"].T.astype(np.float32),
                            "b": sd[f"{b}.attn.in_proj_bias"].astype(np.float32)},
                "out_proj": {"w": sd[f"{b}.attn.out_proj.weight"].T.astype(np.float32),
                             "b": sd[f"{b}.attn.out_proj.bias"].astype(np.float32)},
            },
            "ln2": {"gamma": sd[f"{b}.ln_2.weight"].astype(np.float32),
                    "beta": sd[f"{b}.ln_2.bias"].astype(np.float32)},
            "mlp": {"fc": {"w": sd[f"{b}.mlp.c_fc.weight"].T.astype(np.float32),
                           "b": sd[f"{b}.mlp.c_fc.bias"].astype(np.float32)},
                    "proj": {"w": sd[f"{b}.mlp.c_proj.weight"].T.astype(np.float32),
                             "b": sd[f"{b}.mlp.c_proj.bias"].astype(np.float32)}},
        })
    return {
        "patch_conv": {"w": g("conv1.weight").transpose(2, 3, 1, 0).copy()},
        "class_emb": g("class_embedding"),
        "pos_emb": g("positional_embedding"),
        "ln_pre": {"gamma": g("ln_pre.weight"), "beta": g("ln_pre.bias")},
        "blocks": blocks,
        "ln_post": {"gamma": g("ln_post.weight"), "beta": g("ln_post.bias")},
        "proj": g("proj"),
    }


# ---------------------------------------------------------------------------
# Trained glue encoders (Rotate / Blending / PostProcess checkpoints)
# ---------------------------------------------------------------------------

def _t_modulation(sd: SD, name: str) -> dict:
    def branch(bn):
        return {
            "fc1": t_linear(sd, f"{name}.{bn}.0"),
            "ln": t_ln(sd, f"{name}.{bn}.1"),
            "fc2": t_linear(sd, f"{name}.{bn}.3"),
        }

    return {
        "fc": t_linear(sd, f"{name}.fc"),
        "gamma": branch("gamma_function"),
        "beta": branch("beta_function"),
    }


def convert_rotate(sd: SD) -> dict:
    n = _n_children(sd, "modulation_module_list")
    return {"mods": [_t_modulation(sd, f"modulation_module_list.{i}")
                     for i in range(n)]}


def convert_blending(sd: SD, clip_params=None) -> dict:
    n = _n_children(sd, "modulation_module_list")
    return {
        "mods": [_t_modulation(sd, f"modulation_module_list.{i}")
                 for i in range(n)],
        "clip": clip_params,
    }


def convert_post_process(sd: SD, latent_avg: Array, fs_layers=(9,)) -> dict:
    enc_sd = _subkeys(sd, "encoder_face")
    return {
        "encoder_face": convert_fs_encoder(enc_sd, fs_layers=fs_layers),
        "latent_avg": np.asarray(latent_avg, np.float32),
        "to_feature": convert_feature_iresnet(_subkeys(sd, "to_feature")),
        "to_latent_1": [_t_modulation(sd, f"to_latent_1.{i}")
                        for i in range(_n_children(sd, "to_latent_1"))],
        "to_latent_2": [_t_modulation(sd, f"to_latent_2.{i}")
                        for i in range(_n_children(sd, "to_latent_2"))],
    }
