"""ctypes wrapper for the native image kernels (ops/native/imageproc.cc).

Pillow-compatible antialiased resize + fused normalize-and-pad, used by
the prefetch loader so per-sample CPU work runs on worker threads with
the GIL released (ctypes foreign calls drop the GIL). Falls back to
PIL/numpy transparently when no compiler is available — numerics are
identical either way (tests/test_native_image.py asserts <=1 LSB vs
PIL and exact float equality for normalize+pad)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_METHOD = {"bilinear": 0, "bicubic": 1, "nearest": 2}


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(__file__))
    src = os.path.join(here, "ops", "native", "imageproc.cc")
    so = os.path.join(here, "ops", "native", "libimageproc.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-funroll-loops",
                 "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.resize_u8.restype = ctypes.c_int
        lib.resize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int]
        lib.normalize_pad_f32.restype = ctypes.c_int
        lib.normalize_pad_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64]
        _LIB = lib
    except Exception:                               # noqa: BLE001
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load_native() is not None


def resize_u8(img: np.ndarray, size: Tuple[int, int],
              method: str = "bilinear") -> Optional[np.ndarray]:
    """[h, w, c] or [h, w] uint8 resize to (oh, ow). None when the
    native library is unavailable (caller falls back to PIL)."""
    lib = _load_native()
    if lib is None:
        return None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.uint8)
    rc = lib.resize_u8(img.ctypes.data, h, w, c, out.ctypes.data,
                       oh, ow, _METHOD[method])
    if rc != 0:
        return None
    return out[:, :, 0] if squeeze else out


def normalize_pad(img: np.ndarray, mean: np.ndarray, std: np.ndarray,
                  out_hw: Tuple[int, int],
                  pad_val: Optional[np.ndarray] = None
                  ) -> Optional[np.ndarray]:
    """uint8 [h, w, c] -> float32 [oh, ow, c] (x/255-mean)/std with the
    pad region filled by pad_val (default 0). None -> caller falls back."""
    lib = _load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    oh, ow = out_hw
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    pad = (np.zeros(c, np.float32) if pad_val is None
           else np.ascontiguousarray(pad_val, np.float32))
    out = np.empty((oh, ow, c), np.float32)
    rc = lib.normalize_pad_f32(img.ctypes.data, h, w, c,
                               mean.ctypes.data, std.ctypes.data,
                               pad.ctypes.data, out.ctypes.data, oh, ow)
    if rc != 0:
        return None
    return out
