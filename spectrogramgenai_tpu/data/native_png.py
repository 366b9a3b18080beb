"""ctypes bindings to the native batch PNG→grayscale decoder
(native/png_batch.cpp).

Replaces the per-sample PIL ``Image.open(...).convert("L")`` of the
reference's training loaders (reference helpers.py:141, diff_utils.py:61-136)
with one native call per batch: a C++ thread pool parses/inflates/unfilters
the PNGs and applies PIL's exact ITU-R 601-2 integer RGB→L conversion, so
outputs are bit-identical to the PIL path (tested). Unsupported encodings
(16-bit, interlaced) fall back to PIL per file; a missing toolchain falls
back entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpng_batch.so"))
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "libpng_batch.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.png_batch_load_gray.restype = ctypes.c_int
        lib.png_batch_load_gray.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_png_batch_gray(paths: list[str], height: int, width: int,
                        num_threads: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of (height, width) PNGs → (uint8 [n, H, W], ok [n] bool).

    Rows with ok=False (unsupported encoding, wrong dimensions, missing file)
    are zeroed — the caller decides the fallback (see
    pipeline.load_images_grayscale for the PIL one).
    """
    n = len(paths)
    out = np.zeros((n, height, width), np.uint8)
    ok = np.zeros(n, np.uint8)
    lib = _get_lib()
    if lib is None or n == 0:
        return out, ok.astype(bool)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.png_batch_load_gray(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.strides[0],
        height, width,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads,
    )
    return out, ok.astype(bool)


def _get_save_fn():
    global _lib
    lib = _get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "png_batch_save_rgb"):
        # stale prebuilt library from before the encoder existed — rebuild once
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "-B",
                            "libpng_batch.so"], check=True, capture_output=True)
            _lib = lib = ctypes.CDLL(_LIB_PATH)
            lib.png_batch_load_gray.restype = ctypes.c_int
        except (OSError, subprocess.CalledProcessError, AttributeError):
            return None
        if not hasattr(lib, "png_batch_save_rgb"):
            return None
    lib.png_batch_save_rgb.restype = ctypes.c_int
    lib.png_batch_save_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
    ]
    return lib.png_batch_save_rgb


def _get_encode_fn():
    lib = _get_lib()
    if lib is None or _get_save_fn() is None:  # save-fn getter handles rebuilds
        return None
    lib = _lib  # may have been reloaded by _get_save_fn
    if not hasattr(lib, "png_batch_encode_rgb"):
        return None
    lib.png_batch_encode_rgb.restype = ctypes.c_int
    lib.png_batch_encode_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
    ]
    return lib.png_batch_encode_rgb


def encode_png_batch_rgb(rgb: np.ndarray, num_threads: int = 8,
                         level: int = 3) -> list[bytes] | None:
    """Encode [n, H, W, 3] uint8 → list of in-memory RGB PNG byte strings
    (serving hot path — no file round-trip). Returns None if the native
    library is unavailable or any row failed (caller falls back to PIL)."""
    assert rgb.ndim == 4 and rgb.shape[-1] == 3 and rgb.dtype == np.uint8
    n, h, w = rgb.shape[:3]
    fn = _get_encode_fn()
    if fn is None or n == 0:
        return None if fn is None else []
    # zlib worst case for the Sub-filtered scanlines + PNG framing headroom
    raw = h * (3 * w + 1)
    capacity = raw + raw // 1000 + 64 + 128
    out = np.empty((n, capacity), np.uint8)
    lens = np.empty(n, np.int64)
    rgb = np.ascontiguousarray(rgb)
    good = fn(rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n, h, w,
              out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), capacity,
              lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
              num_threads, level)
    if good != n:
        return None
    return [out[i, : lens[i]].tobytes() for i in range(n)]


def save_png_batch_rgb(rgb: np.ndarray, paths: list[str], num_threads: int = 8,
                       level: int = 3) -> np.ndarray:
    """Write [n, H, W, 3] uint8 images as RGB PNGs (Sub filter, zlib `level`)
    through the C++ thread pool. Returns ok[n] bool; all-False means the
    native library is unavailable (caller falls back to PIL)."""
    n = len(paths)
    assert rgb.shape[0] == n and rgb.shape[-1] == 3 and rgb.dtype == np.uint8
    ok = np.zeros(n, np.uint8)
    fn = _get_save_fn()
    if fn is None or n == 0:
        return ok.astype(bool)
    rgb = np.ascontiguousarray(rgb)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fn(c_paths, n,
       rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
       rgb.shape[1], rgb.shape[2],
       ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
       num_threads, level)
    return ok.astype(bool)
