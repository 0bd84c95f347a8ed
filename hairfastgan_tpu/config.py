"""Unified typed config tree.

The reference spreads configuration over four systems (argparse in
hair_swap.py:108-133, frozen Namespace blobs like SEAN_OPT
pix2pix_model.py:328-339, YAML for FSE configs/001.yaml, and an addict
registry for CtrlHair shape_branch/config.py). Here everything lives in one
dataclass tree; the *values* below are the ABI carried over from those
systems.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StyleGANConfig:
    """StyleGAN2 config-f FFHQ (reference hair_swap.py:116-120)."""

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    max_channels: int = 512  # cap; tests shrink this for fast tiny models

    @property
    def log_size(self) -> int:
        return self.size.bit_length() - 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2  # 18 for 1024

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1  # 17 noise-carrying convs

    def channels(self, res: int) -> int:
        if res <= 32:
            return min(512, self.max_channels)
        return min((2 ** 14 // res) * self.channel_multiplier, self.max_channels)


@dataclasses.dataclass(frozen=True)
class SEANConfig:
    """SEAN CelebA-HQ generator (reference SEAN_OPT, pix2pix_model.py:328-339)."""

    semantic_nc: int = 19
    ngf: int = 64
    crop_size: int = 256
    num_up_layers: int = 5  # 'normal'
    style_dim: int = 512
    z_enc_ngf: int = 32


@dataclasses.dataclass(frozen=True)
class ShapeAdaptorConfig:
    """CtrlHair shape branch (reference shape_branch/config.py:16-40)."""

    hair_dim: int = 16
    face_dim: int = 1024
    pos_encoding_order: int = 10
    layer_num: int = 7
    input_size: int = 256
    norm: str = "ln"
    n_classes: int = 19
    hair_idx: int = 13  # PARSING_LABEL_LIST.index('hair'), global_value_utils.py:49-52


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """CLIP ViT-B/32 image tower (the reference loads it via the clip pip pkg)."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class HairFastConfig:
    """Top-level config matching reference hair_swap.get_parser defaults."""

    stylegan: StyleGANConfig = dataclasses.field(default_factory=StyleGANConfig)
    sean: SEANConfig = dataclasses.field(default_factory=SEANConfig)
    shape_adaptor: ShapeAdaptorConfig = dataclasses.field(default_factory=ShapeAdaptorConfig)
    clip: CLIPConfig = dataclasses.field(default_factory=CLIPConfig)

    # HairFast knobs (hair_swap.py:122-132)
    batch_size: int = 3
    mixing: float = 0.95
    smooth: int = 5  # dilate/erode iterations
    seed: int = 3407

    # I/O
    save_all: bool = False
    save_all_dir: Path = Path("output")
    checkpoint_dir: Path = Path("pretrained_models_jax")

    # TPU execution knobs (new; no reference analog)
    compute_dtype: str = "bfloat16"  # dtype for conv/matmul activations
    param_dtype: str = "float32"
    mesh_data_axis: int = 1  # data-parallel width; >1 shards the triple batch
    # persistent XLA compile cache: the fused 1024^2 swap program takes
    # minutes to compile; caching it makes every later process start in
    # seconds. None (default) leaves the process-global jax config alone —
    # enabling it is a process-level decision, so the CLI turns it on for
    # its own fresh process while library use stays side-effect-free.
    # Also keep it off when dumping HLO with named_scope metadata for
    # tools/attribute_trace.py — the cache key ignores metadata, so a
    # cache hit returns an executable without your scopes.
    compile_cache_dir: Optional[str] = None

    # fast-path knobs (defaults preserve reference behavior)
    # resolution at which the rotated render is re-segmented; the reference
    # parses the full 1024 render (Alignment.py:65-67). 512 halves that
    # BiSeNet cost but measured 94.3% 256-label agreement (80.6% on
    # non-modal pixels) over 100 scaled-random renders
    # (scripts/fastpath_agreement.py) — below the 99% bar, so it stays
    # opt-in until real checkpoints let the parity harness re-judge it.
    rot_seg_size: int = 1024
    # render the rotated image only up to the layer pair needed for
    # segmentation instead of the full 1024 synthesis (partial RGB skip sum;
    # an approximation — None keeps the reference's full render). Measured
    # 78.4% label agreement at pairs=6 (scripts/fastpath_agreement.py):
    # clearly lossy, opt-in only.
    rot_render_pairs: Optional[int] = None
    # largest per-dispatch batch for swap_batch on one chip. Measured on
    # v5e: throughput rises 9.4 -> ~15 transfers/s from B=1 to B=8, then
    # REGRESSES to ~9/s at B=16 (HBM pressure re-tiles the big maps) —
    # larger requests are chunked host-side to this size. 0 disables.
    max_batch_per_dispatch: int = 8
    # batch the swap's two shape modules into one B=2b program
    # (alignment.shape_module_pair). EXACT but measured slower at the
    # default full-res rotated render on v5e (p50 114.5 -> 120.3 ms; the
    # 1024^2 B=2 render tiles worse than two B=1 renders) — opt-in for
    # configs with a reduced rot render where the B=2 maps are small.
    pair_shape_modules: bool = False

    # hair label in the 19-class CelebAMask order used throughout the pipeline
    hair_label: int = 13


DEFAULT_CONFIG = HairFastConfig()
