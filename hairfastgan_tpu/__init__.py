"""HairFastGAN-TPU: a TPU-native (JAX/XLA/Pallas/pjit) hairstyle-transfer framework.

A from-scratch re-design of the capabilities of AIRI-Institute/HairFastGAN
(reference layout documented in SURVEY.md) as a single device-resident JAX
program: StyleGAN2 synthesis with a layer-slice API, e4e / FeatureStyle
inversion, BiSeNet parsing, SEAN inpainting, CtrlHair shape adaptor, CLIP
blending and FS post-processing, all as pure functions over frozen parameter
pytrees, sharded over a `jax.sharding.Mesh` for batched triples.
"""

__version__ = "0.1.0"

from hairfastgan_tpu.config import HairFastConfig  # noqa: F401


def __getattr__(name):  # lazy top-level conveniences (avoid heavy imports)
    if name == "HairFast":
        from hairfastgan_tpu.api import HairFast

        return HairFast
    if name == "hair_fast":
        from hairfastgan_tpu.pipeline import hair_fast

        return hair_fast
    if name in ("init_zoo", "load_zoo", "init_tiny_zoo"):
        from hairfastgan_tpu import zoo

        return getattr(zoo, name)
    raise AttributeError(name)

