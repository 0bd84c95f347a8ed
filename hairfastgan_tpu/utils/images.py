"""Host-side image IO and coercion (the only part of the pipeline off-device).

Mirrors the input flexibility of reference hair_swap.py:76-91 (Tensor / PIL /
ndarray / path) plus the uint8 -> [0,1] float conversion of
datasets/image_dataset.py:5-29 and utils/image_utils.equal_replacer's
object-identity dedup (:15-24).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Union

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


TImage = Union[np.ndarray, "Image.Image", str, Path]


def to_image_array(img: TImage, size: int = 1024) -> np.ndarray:
    """Anything -> [H,W,3] float32 in [0,1] (NHWC row)."""
    if isinstance(img, (str, Path)):
        if Image is None:
            raise RuntimeError("PIL required to load image paths")
        img = Image.open(str(img)).convert("RGB")
    if Image is not None and isinstance(img, Image.Image):
        img = np.asarray(img)
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (1, 2, 0))  # CHW (torch) -> HWC
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    if arr.shape[:2] != (size, size):
        if Image is None:
            raise ValueError(f"image must be {size}x{size}, got {arr.shape}")
        pil = Image.fromarray((arr * 255).astype(np.uint8))
        arr = np.asarray(pil.resize((size, size), Image.LANCZOS)).astype(np.float32) / 255.0
    return arr


def to_raw_image(img: TImage) -> np.ndarray:
    """Anything -> [H,W,3] float32 in [0,1] at the ORIGINAL size.

    The alignment path crops a quad from the original pixels (reference
    runs dlib on the unresized photo, utils/shape_predictor.py:49-77);
    pre-squashing to the generator size would warp the geometry and throw
    away resolution before the FFHQ transform.
    """
    if isinstance(img, (str, Path)):
        if Image is None:
            raise RuntimeError("PIL required to load image paths")
        img = Image.open(str(img)).convert("RGB")
    if Image is not None and isinstance(img, Image.Image):
        img = np.asarray(img)
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (1, 2, 0))
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr


def to_image_u8(img: TImage, size: int = 1024) -> np.ndarray:
    """Anything -> [H,W,3] uint8 (device normalizes; 1/4 transfer bytes).

    A right-shaped uint8 HWC array passes through copy-free — the serving
    hot path skips two full-image float conversions.
    """
    if (isinstance(img, np.ndarray) and img.dtype == np.uint8
            and img.shape == (size, size, 3)):
        return img
    if (isinstance(img, np.ndarray) and img.dtype == np.uint8
            and img.ndim == 3 and img.shape[-1] == 3):
        # uint8 HWC needing only a resize (the upload_res serving coerce).
        # Native path: the loader's Keys a=-0.75 separable resize — 8.5 ms
        # vs PIL LANCZOS's 16.0 per 1024->512 on this host, AND the same
        # kernel as the on-device resampler (measured max 1 u8 step vs the
        # device bicubic, where LANCZOS diverges up to 134/255 — a
        # different filter). PIL fallback when the native lib is absent.
        from hairfastgan_tpu.data import native_loader as _nl

        if _nl.resize_u8_available():
            return _nl.resize_u8_native(img, size)
        if Image is not None:
            # resampling u8 directly is bit-identical to the float
            # round-trip below (PIL resamples the same 8-bit samples) and
            # skips two full-image float conversions
            return np.asarray(Image.fromarray(img).resize((size, size),
                                                          Image.LANCZOS))
    arr = to_image_array(img, size)
    return np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)


def _same_values(a: np.ndarray, b: np.ndarray) -> bool:
    """allclose with a strided-sample short circuit: a differing sample
    already proves inequality, so the full-image compare (the common case —
    three DISTINCT photos) is skipped."""
    if a.shape != b.shape:
        return False
    sa, sb = a[::31, ::37], b[::31, ::37]
    if not np.allclose(sa, sb):
        return False
    if a.dtype == np.uint8 and b.dtype == np.uint8:
        # allclose's integer tolerances (rtol*255 < 0.5) are exact equality
        return np.array_equal(a, b)
    return np.allclose(a, b)


def equal_replacer(images: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Replace value-equal arrays with the SAME object so `is` fast paths fire
    (reference utils/image_utils.py:15-24)."""
    out: List[np.ndarray] = []
    for img in images:
        for prev in out:
            if img is prev or _same_values(img, prev):
                img = prev
                break
        out.append(img)
    return out


def save_image01(path: Union[str, Path], img01: np.ndarray) -> None:
    """[H,W,3] or [1,H,W,3] float in [0,1] (or uint8 in [0,255]) -> PNG."""
    if Image is None:
        raise RuntimeError("PIL required to save images")
    arr = np.asarray(img01)
    if arr.ndim == 4:
        arr = arr[0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(str(path))
