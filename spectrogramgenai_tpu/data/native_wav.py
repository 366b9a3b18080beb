"""ctypes bindings to the native batch WAV decoder (native/wav_batch.cpp).

Builds on demand with g++ (cached .so next to the source); falls back to the
pure-Python scipy path if the toolchain or build is unavailable, so the
framework never hard-depends on the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwav_batch.so"))
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wav_batch_load.restype = ctypes.c_int
        lib.wav_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_wav_batch(paths: list[str], begin_times, end_times, clip_seconds: float,
                   clip_samples: int, num_threads: int = 8):
    """Decode+slice a batch of WAVs → (float32 [n, clip_samples], sample_rates [n]).

    clip_samples must be clip_seconds × the expected sample rate; rows whose
    file has a different rate still fill clip_seconds×sr samples (zero-padded
    or truncated to the buffer) and report their rate for regrouping.
    """
    lib = _get_lib()
    n = len(paths)
    out = np.zeros((n, clip_samples), np.float32)
    rates = np.zeros(n, np.int32)
    if lib is None:
        from spectrogramgenai_tpu.audio.wavio import load_wav, slice_clip

        for i, p in enumerate(paths):
            try:
                wav, sr = load_wav(p)
            except (OSError, ValueError):
                continue
            clip = slice_clip(wav, sr, begin_times[i], end_times[i], clip_seconds)
            m = min(len(clip), clip_samples)
            out[i, :m] = clip[:m]
            rates[i] = sr
        return out, rates

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    bt = np.ascontiguousarray(begin_times, np.float64)
    et = np.ascontiguousarray(end_times, np.float64)
    lib.wav_batch_load(
        c_paths, n,
        bt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        et.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        clip_seconds,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.strides[0] // 4,
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out, rates
