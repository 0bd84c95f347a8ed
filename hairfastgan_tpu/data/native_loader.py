"""ctypes binding for the native C++ prefetching image loader.

The native side (native/hf_loader.cpp) replaces the reference's PIL+joblib
host loading (utils/train.py:114-122) with threaded libjpeg/libpng decode +
bicubic resize straight into float32 NHWC buffers. Build happens lazily on
first use (g++ one-liner, cached next to the source); environments without
a toolchain fall back to the PIL path in utils/images.py.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libhf_loader.so"
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_NATIVE_DIR / "hf_loader.cpp"),
           "-o", str(_LIB_PATH), "-ljpeg", "-lpng", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.hfl_create.restype = ctypes.c_void_p
    lib.hfl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int]
    lib.hfl_next.restype = ctypes.c_int
    lib.hfl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int)]
    lib.hfl_destroy.argtypes = [ctypes.c_void_p]
    lib.hfl_load_one.restype = ctypes.c_int
    lib.hfl_load_one.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_float)]
    lib.hfl_create2.restype = ctypes.c_void_p
    lib.hfl_create2.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int]
    lib.hfl_next_bytes.restype = ctypes.c_int
    lib.hfl_next_bytes.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int)]
    lib.hfl_load_one_u8.restype = ctypes.c_int
    lib.hfl_load_one_u8.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_ubyte)]
    try:  # round-5 ABI addition; absent from older prebuilt .so files
        lib.hfl_resize_u8.argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_ubyte)]
    except AttributeError:
        pass
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def load_image_native(path: str, out_size: int = 1024) -> np.ndarray:
    """One image -> [out_size, out_size, 3] float32 in [0,1]."""
    lib = _load_lib()
    out = np.empty((out_size, out_size, 3), np.float32)
    ok = lib.hfl_load_one(str(path).encode(), out_size,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if not ok:
        raise IOError(f"native decode failed for {path}")
    return out


def load_image_native_u8(path: str, out_size: int = 1024) -> np.ndarray:
    """One image -> [out_size, out_size, 3] uint8.

    Serving fast path: the swap programs normalize uint8 on-device
    (pipeline/embedding.py), so u8 ships 4x fewer bytes host->device.
    """
    lib = _load_lib()
    out = np.empty((out_size, out_size, 3), np.uint8)
    ok = lib.hfl_load_one_u8(
        str(path).encode(), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if not ok:
        raise IOError(f"native decode failed for {path}")
    return out


def resize_u8_native(img: np.ndarray, out_size: int) -> np.ndarray:
    """[H,W,3] uint8 -> [out_size,out_size,3] uint8, Keys a=-0.75 bicubic.

    The in-memory twin of `load_image_native_u8`'s resize stage, for the
    serving `upload_res` coercion (utils/images.to_image_u8): same
    separable kernel as the on-device resampler (ops/resample.resize
    bicubic), where the PIL fallback substitutes LANCZOS. Raises if the
    loaded .so predates the hfl_resize_u8 ABI addition — callers gate on
    `resize_u8_available()`.
    """
    lib = _load_lib()
    img = np.ascontiguousarray(img)
    out = np.empty((out_size, out_size, 3), np.uint8)
    ok = lib.hfl_resize_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if not ok:
        raise IOError("native resize failed")
    return out


def resize_u8_available() -> bool:
    try:
        return hasattr(_load_lib(), "hfl_resize_u8")
    except Exception:
        return False


class NativeImageLoader:
    """Threaded prefetching loader over a list of paths.

    Iterates (index, image) in completion order; decode failures yield
    index < 0 and are skipped with a warning.

    dtype np.uint8 prefetches raw u8 pixels (4x smaller queue + host->device
    transfer; the swap programs normalize u8 on-device), np.float32 the
    reference-equivalent [0,1] floats.
    """

    def __init__(self, paths: Sequence[str], out_size: int = 1024,
                 threads: int = 4, dtype=np.float32):
        self._lib = _load_lib()
        self.paths = [str(p) for p in paths]
        self.out_size = out_size
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype(np.float32), np.dtype(np.uint8)):
            raise ValueError(f"dtype must be float32 or uint8, got {dtype}")
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        fmt = 1 if self.dtype == np.uint8 else 0
        self._handle = self._lib.hfl_create2(arr, len(self.paths), out_size,
                                             threads, fmt)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        idx = ctypes.c_int(0)
        while True:
            out = np.empty((self.out_size, self.out_size, 3), self.dtype)
            ok = self._lib.hfl_next_bytes(
                self._handle,
                out.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(idx))
            if not ok:
                break
            if idx.value < 0:
                import warnings

                warnings.warn(f"decode failed: {self.paths[-idx.value - 1]}")
                continue
            yield idx.value, out

    def close(self):
        if self._handle:
            self._lib.hfl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
