"""Native C++ loader: decode/resize parity vs PIL + prefetch-queue behavior."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from hairfastgan_tpu.data.native_loader import (
    NativeImageLoader,
    load_image_native,
    load_image_native_u8,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (ext, size) in enumerate([("png", 96), ("jpg", 128), ("png", 64)]):
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        p = d / f"img{i}.{ext}"
        Image.fromarray(arr).save(str(p))
        paths.append(str(p))
    return paths


def test_load_one_png_roundtrip(image_files):
    p = image_files[0]
    out = load_image_native(p, 96)  # same size -> exact uint8/255
    ref = np.asarray(Image.open(p)).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_load_one_resize_matches_device_resampler(image_files):
    """C++ resize == the on-device bicubic (torch a=-0.75 formula)."""
    import jax.numpy as jnp

    from hairfastgan_tpu.ops.resample import resize

    p = image_files[0]
    out = load_image_native(p, 64)
    src = np.asarray(Image.open(p)).astype(np.float32) / 255.0
    ref = np.asarray(resize(jnp.asarray(src)[None], (64, 64), "bicubic"))[0]
    np.testing.assert_allclose(out, np.clip(ref, 0, 1), atol=2e-3)


def test_jpeg_decodes(image_files):
    out = load_image_native(image_files[1], 128)
    assert out.shape == (128, 128, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_prefetch_loader_completes(image_files):
    loader = NativeImageLoader(image_files * 4, out_size=32, threads=3)
    seen = sorted(i for i, _ in loader)
    assert seen == list(range(12))
    loader.close()


def test_missing_file_skipped(image_files, tmp_path):
    loader = NativeImageLoader([image_files[0], str(tmp_path / "nope.png")],
                               out_size=32, threads=2)
    with pytest.warns(UserWarning):
        seen = [i for i, _ in loader]
    assert seen == [0]
    loader.close()


def test_prefetch_loader_stress(image_files):
    """Concurrency stress: many items, more threads than queue slots —
    every index delivered exactly once, no deadlock (the loader is our one
    hand-rolled synchronization primitive; SURVEY.md §5.2)."""
    paths = image_files * 40  # 120 items
    loader = NativeImageLoader(paths, out_size=16, threads=8)
    seen = [i for i, _ in loader]
    assert sorted(seen) == list(range(len(paths)))
    assert len(set(seen)) == len(paths)
    loader.close()


def test_load_one_u8_passthrough(image_files):
    """Right-sized u8 load is an exact byte passthrough of the file."""
    p = image_files[0]
    out = load_image_native_u8(p, 96)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, np.asarray(Image.open(p)))


def test_load_one_u8_resize_matches_float_quantized(image_files):
    """Resized u8 == round-half-up of the float path (utils.to_image_u8)."""
    p = image_files[0]
    u8 = load_image_native_u8(p, 64)
    f = load_image_native(p, 64)
    ref = np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(u8, ref)


def test_prefetch_loader_u8(image_files):
    """u8 prefetch delivers every index once with u8 arrays matching the
    single-shot u8 load."""
    loader = NativeImageLoader(image_files * 4, out_size=32, threads=3,
                               dtype=np.uint8)
    got = {i: img for i, img in loader}
    assert sorted(got) == list(range(12))
    for i, img in got.items():
        assert img.dtype == np.uint8
        ref = load_image_native_u8(image_files[i % 3], 32)
        np.testing.assert_array_equal(img, ref)
    loader.close()


def test_loader_early_close(image_files):
    """Destroying mid-stream must not hang or crash workers."""
    loader = NativeImageLoader(image_files * 10, out_size=16, threads=4)
    it = iter(loader)
    next(it)
    loader.close()  # workers joined with items still queued


def test_resize_u8_matches_device_bicubic():
    """hfl_resize_u8 (the upload_res serving coerce, round 5) uses the SAME
    Keys a=-0.75 separable kernel as the on-device resampler — quantized
    agreement within 1 u8 step (PIL LANCZOS, the fallback, is a different
    filter: measured up to 134/255 off the device bicubic)."""
    import jax.numpy as jnp

    from hairfastgan_tpu.data.native_loader import (resize_u8_available,
                                                    resize_u8_native)
    from hairfastgan_tpu.ops.resample import resize

    if not resize_u8_available():
        pytest.skip("native lib predates hfl_resize_u8")
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    nat = resize_u8_native(img, 64)
    dev = np.asarray(resize(jnp.asarray(img[None], jnp.float32) / 255.0,
                            (64, 64), "bicubic"))[0]
    dev_u8 = np.clip(dev * 255.0 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(nat.astype(int) - dev_u8.astype(int)).max() <= 1
    # upscale path stays in-bounds and right-shaped too
    up = resize_u8_native(img[:64, :64], 128)
    assert up.shape == (128, 128, 3) and up.dtype == np.uint8
