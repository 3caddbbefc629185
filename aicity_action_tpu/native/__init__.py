"""ctypes binding for the native host-preprocessing library.

Builds ``libpreprocess.so`` on first use (make, ~1 s) and exposes
:func:`crop_resize_normalize`. Falls back to ``None`` when no toolchain is
available — callers keep the numpy/cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpreprocess.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.crop_resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.crop_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def crop_resize_u8(
    frames: np.ndarray,
    roi: tuple[int, int, int, int],
    out_size: int,
) -> np.ndarray | None:
    """Fused crop→resize keeping uint8 (normalize on-device).

    Returns uint8 [T, out_size, out_size, 3] or None when unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, C = frames.shape
    assert C == 3
    x1, y1, x2, y2 = (int(v) for v in roi)
    out = np.empty((T, out_size, out_size, 3), np.uint8)
    lib.crop_resize_u8(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, x1, y1, x2, y2, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def crop_resize_normalize(
    frames: np.ndarray,
    roi: tuple[int, int, int, int],
    out_size: int,
    mean,
    std,
) -> np.ndarray | None:
    """Fused crop→resize→normalize for a uint8 RGB clip [T, H, W, 3].

    Returns float32 [T, out_size, out_size, 3], or None if the native lib is
    unavailable (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, C = frames.shape
    assert C == 3
    x1, y1, x2, y2 = (int(v) for v in roi)
    out = np.empty((T, out_size, out_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.crop_resize_normalize(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, x1, y1, x2, y2, out_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
