"""Zoo assembly: all 9 model families as one frozen parameter pytree.

`init_zoo` builds a randomly-initialized zoo (tests / bench without
checkpoints); `load_zoo` fills it from converted reference checkpoints
(SURVEY.md §2.12 inventory) via params/convert.py. The reference
instantiates three separate StyleGAN2 copies (Net, FSE trainer, e4e pSp —
SURVEY.md §3.1); here there is exactly ONE generator in the tree.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.models import bisenet, clip_vit, e4e, encoders, iresnet, sean
from hairfastgan_tpu.models import shape_adaptor as sa
from hairfastgan_tpu.models import stylegan2


def init_zoo(key, cfg: HairFastConfig = HairFastConfig()) -> Dict:
    n_latent = cfg.stylegan.n_latent
    keys = jax.random.split(key, 10)
    clip_params = clip_vit.init_clip_image_tower(keys[7])
    return {
        "generator": stylegan2.init_generator_params(keys[0], cfg.stylegan),
        "e4e": e4e.init_e4e(keys[1], n_styles=n_latent),
        "fse": iresnet.init_fs_encoder(keys[2], n_styles=n_latent, fs_layers=(5,)),
        "fse_latent_avg": jnp.zeros((n_latent, 512), jnp.float32),
        "bisenet": bisenet.init_bisenet(keys[3], n_classes=19),
        "sean": sean.init_sean_generator(keys[4]),
        "shape_adaptor": sa.init_shape_adaptor(keys[5]),
        "rotate": encoders.init_rotate_model(keys[6]),
        "blending": encoders.init_blending_model(keys[8], clip_params=clip_params),
        "post_process": _init_pp(keys[9], n_latent),
    }


def _init_pp(key, n_latent: int):
    p = encoders.init_post_process_model(key)
    if n_latent != 18:
        p["encoder_face"] = iresnet.init_fs_encoder(key, n_styles=n_latent,
                                                    fs_layers=(9,))
        p["latent_avg"] = jnp.zeros((n_latent, 512), jnp.float32)
    return p


def init_tiny_zoo(key, size: int = 128, max_channels: int = 512):
    """Small-resolution zoo + config for CPU smoke tests.

    Shrinks the generator resolution and the trunk depths; channel widths
    stay REAL because the FS interface is structural: FSE content and
    PostProcess F_final are 512-channel maps injected at generator pairs
    3 and 5. The perception models keep their real geometries (input-size
    agnostic, or fixed at 256 like SEAN / the shape adaptor).
    """
    import dataclasses

    from hairfastgan_tpu.config import StyleGANConfig

    cfg = HairFastConfig(stylegan=StyleGANConfig(size=size, max_channels=max_channels))
    n_latent = cfg.stylegan.n_latent
    keys = jax.random.split(key, 10)
    clip_params = clip_vit.init_clip_image_tower(keys[7], width=64, layers=2,
                                                 heads=2, embed_dim=512)
    pp = {
        "encoder_face": iresnet.init_fs_encoder(keys[9], n_styles=n_latent,
                                                fs_layers=(9,), depth=18),
        "latent_avg": jnp.zeros((n_latent, 512), jnp.float32),
        "to_feature": iresnet.init_feature_iresnet(keys[9]),
        "to_latent_1": [encoders.init_modulation_module(k, n_latent)
                        for k in jax.random.split(keys[9], 5)],
        "to_latent_2": [encoders.init_modulation_module(k, n_latent)
                        for k in jax.random.split(keys[8], 5)],
    }
    zoo = {
        "generator": stylegan2.init_generator_params(keys[0], cfg.stylegan),
        "e4e": e4e.init_e4e(keys[1], n_styles=n_latent, se=False),
        "fse": iresnet.init_fs_encoder(keys[2], n_styles=n_latent,
                                       fs_layers=(5,), depth=18),
        "fse_latent_avg": jnp.zeros((n_latent, 512), jnp.float32),
        "bisenet": bisenet.init_bisenet(keys[3], n_classes=19),
        "sean": sean.init_sean_generator(keys[4], ngf=16),
        "shape_adaptor": sa.init_shape_adaptor(keys[5]),
        "rotate": encoders.init_rotate_model(keys[6]),
        "blending": encoders.init_blending_model(keys[8], clip_params=clip_params),
        "post_process": pp,
    }
    return zoo, cfg


def init_micro_zoo(key, size: int = 128, max_channels: int = 128,
                   width: float = 0.25):
    """Thinner-than-tiny zoo for multi-device EXECUTION checks.

    `init_tiny_zoo` keeps the real structural widths (512-ch FS interface)
    so single-sample CPU tests exercise the true architecture — but
    executing the composed pipeline once per shard on the 1-core CI host is
    then ~10 min of pure compute (the dryrun/mesh-test wall; compile is
    ~10 s with the warm cache). This zoo keeps every model family and the
    full composition, but scales the generator's max_channels and every
    internal trunk width down; the claims it backs (sharded == single
    device) are about PLACEMENT and program structure, not channel counts.
    The FS interface stays structurally consistent: the FSE content map
    matches channels(16) and PP's F_final matches channels(64) of THIS
    generator config.
    """
    from hairfastgan_tpu.config import StyleGANConfig

    cfg = HairFastConfig(stylegan=StyleGANConfig(size=size,
                                                 max_channels=max_channels))
    n_latent = cfg.stylegan.n_latent
    c16 = cfg.stylegan.channels(16)
    c64 = cfg.stylegan.channels(64)
    keys = jax.random.split(key, 10)
    clip_params = clip_vit.init_clip_image_tower(keys[7], width=64, layers=2,
                                                 heads=2, embed_dim=512)
    pp = {
        "encoder_face": iresnet.init_fs_encoder(keys[9], n_styles=n_latent,
                                                fs_layers=(9,), depth=18,
                                                width=width, content_ch=c64),
        "latent_avg": jnp.zeros((n_latent, 512), jnp.float32),
        "to_feature": iresnet.init_feature_iresnet(
            keys[9], blocks=((c64, 1), (c64, 1)), inplanes=2 * c64),
        "to_latent_1": [encoders.init_modulation_module(k, n_latent)
                        for k in jax.random.split(keys[9], 5)],
        "to_latent_2": [encoders.init_modulation_module(k, n_latent)
                        for k in jax.random.split(keys[8], 5)],
    }
    zoo = {
        "generator": stylegan2.init_generator_params(keys[0], cfg.stylegan),
        "e4e": e4e.init_e4e(keys[1], n_styles=n_latent, se=False, width=width),
        "fse": iresnet.init_fs_encoder(keys[2], n_styles=n_latent,
                                       fs_layers=(5,), depth=18,
                                       width=width, content_ch=c16),
        "fse_latent_avg": jnp.zeros((n_latent, 512), jnp.float32),
        "bisenet": bisenet.init_bisenet(keys[3], n_classes=19, width=width),
        "sean": sean.init_sean_generator(keys[4], ngf=8, z_ngf=8),
        "shape_adaptor": sa.init_shape_adaptor(keys[5], hidden=8),
        "rotate": encoders.init_rotate_model(keys[6]),
        "blending": encoders.init_blending_model(keys[8], clip_params=clip_params),
        "post_process": pp,
    }
    return zoo, cfg


def _fill_random(shapes, seed: int):
    """numpy-filled pytree matching `shapes` (deterministic in `seed`)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def make(path, leaf):
        # batchnorm running stats must keep their init semantics: a random
        # "var" can be NEGATIVE and rsqrt(var+eps) NaNs the whole pipeline
        key = path[-1].key if hasattr(path[-1], "key") else None
        if key == "var":
            return np.ones(leaf.shape, leaf.dtype)
        if key == "mean":
            return np.zeros(leaf.shape, leaf.dtype)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return (rng.standard_normal(leaf.shape, dtype=np.float32) * 0.05
                    ).astype(leaf.dtype)
        return np.zeros(leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map_with_path(make, shapes)


def init_zoo_fast(seed: int = 0, cfg: HairFastConfig = HairFastConfig()) -> Dict:
    """Shape-correct random zoo via eval_shape + numpy (seconds, not minutes).

    `init_zoo` threads jax.random keys per leaf — correct for training
    inits but slow for a ~2 GB tree on one host core. Benchmarks only need
    the right shapes/dtypes and sane magnitudes; this generates every leaf
    with numpy in one pass. NOTE: flat random weights collapse BiSeNet
    argmax diversity — use a scaled real-init zoo for accuracy
    measurements (scripts/fastpath_agreement.py).
    """
    shapes = jax.eval_shape(lambda: init_zoo(jax.random.PRNGKey(0), cfg))
    return _fill_random(shapes, seed)


def init_micro_zoo_fast(seed: int = 0, size: int = 128,
                        max_channels: int = 128, width: float = 0.25):
    """`init_micro_zoo` shapes, numpy-filled (seconds — the jax.random init
    costs ~2 min of tiny dispatches on a 1-core host, which was most of the
    warm dryrun's remaining budget)."""
    from hairfastgan_tpu.config import StyleGANConfig

    shapes = jax.eval_shape(
        lambda: init_micro_zoo(jax.random.PRNGKey(0), size, max_channels,
                               width)[0])
    cfg = HairFastConfig(stylegan=StyleGANConfig(size=size,
                                                 max_channels=max_channels))
    return _fill_random(shapes, seed), cfg


def pack_zoo(zoo: Dict) -> Dict:
    """Inference-layout packing of the zoo (exact, idempotent) — OPT-IN.

    Re-lays-out weight families into consolidated ops: e4e/pSp style heads
    -> dense first conv + per-head batched-matmul chains
    (models/e4e.pack_style_heads), SEAN ACE fc_mu/gamma-beta pairs
    (models/sean.pack_sean), FSE style heads (iresnet.pack_fs_styles).

    MEASURED SLOWER on v5e for ALL THREE families (B=2-3 inference shapes,
    10x-amplified micro-bench, ms/call): e4e 5.2 -> 7.1 (grouped conv) /
    7.9 (einsum chain), SEAN decode 4.1 -> 4.4, FSE 2.1 -> 2.3; full swap
    p50 111.5 -> 121.2 ms. XLA schedules the many-small-op unpacked form
    better than consolidated grouped/batched matmuls at tiny M. Kept as an
    equality-tested experiment hook (the api/bench default is unpacked);
    model forwards dispatch on whichever layout they get.
    """
    q = dict(zoo)
    if "e4e" in q:
        q["e4e"] = e4e.pack_style_heads(q["e4e"])
    if "sean" in q:
        q["sean"] = sean.pack_sean(q["sean"])
    if "fse" in q:
        q["fse"] = iresnet.pack_fs_styles(q["fse"])
    if "post_process" in q and "encoder_face" in q["post_process"]:
        pp = dict(q["post_process"])
        pp["encoder_face"] = iresnet.pack_fs_styles(pp["encoder_face"])
        q["post_process"] = pp
    return q


def cast_zoo(zoo: Dict, dtype=jnp.bfloat16) -> Dict:
    """Cast the zoo's float leaves to the compute dtype (weights-resident form).

    The swap program computes in bf16 end to end; keeping the ~1.2 GB of f32
    weights on device means every call re-reads them at double width and
    inserts a convert per consumer (profiled ~3 ms/swap of pure weight
    casts). Norm statistics still get promoted to f32 *inside* the norm
    folding math (ops/basic.py), which is precision-adequate from bf16
    stats. Integer leaves (label tables) and `Static` config are untouched.
    """
    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, zoo)


def load_zoo(checkpoint_dir: Path, cfg: HairFastConfig = HairFastConfig()) -> Dict:
    """Load the zoo pytree from a checkpoint directory.

    Fast path: `<dir>/zoo` written by scripts/convert_checkpoints.py (orbax,
    seconds to restore). Fallback: the reference's raw pretrained_models/
    torch layout (SURVEY.md §2.12), converted on the fly via
    params/convert.py; missing files raise with the file name so partial
    zoos can be diagnosed.
    """
    import numpy as np

    from hairfastgan_tpu.params import convert as C

    d = Path(checkpoint_dir)
    if (d / "zoo").exists():
        from hairfastgan_tpu.params.checkpoint import restore_pytree

        return jax.tree.map(jnp.asarray, restore_pytree(d / "zoo"))

    import torch

    raw = torch.load(str(d / "StyleGAN/ffhq.pt"), map_location="cpu", weights_only=False)
    g_ema = {k: v.numpy() for k, v in raw["g_ema"].items()}
    latent_avg = raw["latent_avg"].numpy()  # [512] or [18,512]
    if latent_avg.ndim == 1:
        latent_avg = np.tile(latent_avg[None], (cfg.stylegan.n_latent, 1))

    e4e_sd = C.load_torch_state_dict(str(d / "encoder4editing/e4e_ffhq_encode.pt"))
    e4e_enc = {k[len("encoder."):]: v for k, v in e4e_sd.items()
               if k.startswith("encoder.")}
    e4e_avg_raw = torch.load(str(d / "encoder4editing/e4e_ffhq_encode.pt"),
                             map_location="cpu", weights_only=False)
    e4e_avg = e4e_avg_raw.get("latent_avg")
    e4e_avg = e4e_avg.numpy() if e4e_avg is not None else latent_avg

    fse_sd = C.load_torch_state_dict(str(d / "FeatureStyleEncoder/143_enc.pth"))
    fse_sd = {k[len("enc."):] if k.startswith("enc.") else k: v
              for k, v in fse_sd.items()}

    bise_sd = C.load_torch_state_dict(str(d / "BiSeNet/face_parsing_79999_iter.pth"))
    sean_sd = C.load_torch_state_dict(
        str(d / "sean_checkpoints/CelebA-HQ_pretrained/latest_net_G.pth"))
    mean_codes = C.load_sean_mean_codes(str(d / "sean_mean_codes"))
    shape_sd = C.load_torch_state_dict(str(d / "ShapeAdaptor/mask_generator.pth"))
    rotate_sd = C.load_torch_state_dict(str(d / "Rotate/rotate_best.pth"),
                                        key="model_state_dict")
    blend_sd = C.load_torch_state_dict(str(d / "Blending/checkpoint.pth"),
                                       key="model_state_dict")
    pp_sd = C.load_torch_state_dict(str(d / "PostProcess/pp_model.pth"),
                                    key="model_state_dict")
    pp_avg = torch.load(str(d / "PostProcess/latent_avg.pt"),
                        map_location="cpu").numpy()
    clip_sd = C.load_torch_state_dict(str(d / "clip_vit_b32.pt"))

    clip_params = C.convert_clip_image_tower(clip_sd)
    zoo = {
        "generator": C.convert_stylegan2(g_ema),
        "e4e": C.convert_e4e(e4e_enc, latent_avg=e4e_avg),
        "fse": C.convert_fs_encoder(fse_sd, fs_layers=(5,)),
        "fse_latent_avg": latent_avg,
        "bisenet": C.convert_bisenet(bise_sd, n_classes=19),
        "sean": C.convert_sean(sean_sd, mean_codes=mean_codes),
        "shape_adaptor": C.convert_shape_adaptor(shape_sd),
        "rotate": C.convert_rotate(rotate_sd),
        "blending": C.convert_blending(blend_sd, clip_params=clip_params),
        "post_process": C.convert_post_process(pp_sd, latent_avg=pp_avg),
    }
    # optional: STAR landmark model — enables the on-device (dlib-free)
    # align=True path (utils/face_align.star_landmark_provider) and the
    # rotate-training keypoint loss. Absent file just omits the entry.
    star_ckpt = d / "star_wflw.pth"
    if star_ckpt.exists():
        from hairfastgan_tpu.models import star

        zoo["star"] = star.convert_star(
            C.load_torch_state_dict(str(star_ckpt), key="net"))
    return jax.tree.map(jnp.asarray, zoo)
