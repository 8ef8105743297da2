"""ctypes bindings for the native host-pipeline core (native/bicubic.cpp).

The reference leans on native code for all host-side image work (cv2,
torch ATen — SURVEY.md §2.9); our equivalent is a small C++ library for
the hot path (MATLAB-exact bicubic in every RandomDownSampling call).
Falls back to the numpy implementation when the library isn't built.

Build:  make -C native        (or CIAOSR_BUILD_NATIVE=1 to build on import)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "build", "libciaosr_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and os.environ.get("CIAOSR_BUILD_NATIVE"):
        try:
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.matlab_bicubic_resize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int]
        lib.matlab_bicubic_resize.restype = None
        assert lib.ciaosr_native_version() >= 1
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def ensure_built() -> bool:
    """Force a (re)build attempt even if an earlier import already failed
    to load — `_load` caches its first result, so a test that sets
    CIAOSR_BUILD_NATIVE after some other module touched this one would
    otherwise see a stale negative."""
    global _TRIED
    if _LIB is None:
        _TRIED = False
        os.environ["CIAOSR_BUILD_NATIVE"] = "1"
    return available()


def bicubic_resize(img: np.ndarray, out_h: int, out_w: int, scale: float,
                   antialiasing: bool = True,
                   n_threads: int | None = None) -> np.ndarray | None:
    """Native MATLAB bicubic; returns None if the library isn't available.

    img: (H, W, C) float32 contiguous.
    """
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    threads = n_threads or min(8, os.cpu_count() or 1)
    lib.matlab_bicubic_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        float(scale), int(antialiasing), threads)
    return out
