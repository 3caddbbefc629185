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
                # explicit target: the default `all` also builds the FFmpeg
                # decoder, whose failure on header-less hosts must not take
                # the preprocessing library down with it
                subprocess.run(
                    ["make", "-C", _DIR, "libpreprocess.so"], check=True,
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


# ---------------------------------------------------------------------------
# First-party FFmpeg decoder (libvideodec.so) — sequential/seekable I420
# frame reads for the sliding-window chunk path. See videodec.cpp.

_VDEC_PATH = os.path.join(_DIR, "libvideodec.so")
_vdec_lib = None
_vdec_tried = False


def _load_vdec():
    global _vdec_lib, _vdec_tried
    with _lock:
        if _vdec_tried:
            return _vdec_lib
        _vdec_tried = True
        if not os.path.exists(_VDEC_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "libvideodec.so"], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_VDEC_PATH)
        except OSError:
            return None
        lib.vdec_open.restype = ctypes.c_void_p
        lib.vdec_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vdec_read_i420.restype = ctypes.c_int
        lib.vdec_read_i420.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.vdec_seek.restype = ctypes.c_int
        lib.vdec_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.vdec_skip.restype = ctypes.c_int64
        lib.vdec_skip.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.vdec_close.argtypes = [ctypes.c_void_p]
        _vdec_lib = lib
        return _vdec_lib


class VideoDecoderI420:
    """Sequential (seekable) decoder emitting ROI-cropped, resized planar
    I420 frames — ``read(out)`` fills a u8 ``[size*3//2, size]`` row.

    Decodes to the encoder's own yuv420p planes and sws-scales them
    (1.5 B/px, no YUV->BGR->YUV round trip) — measured ~2x faster per frame
    than the cv2 path on this host. Construction raises ``RuntimeError``
    when the library or the container's codec/pixel format is unsupported;
    callers fall back to cv2.
    """

    def __init__(self, path: str, size: int,
                 roi_px: "tuple[int, int, int, int] | None" = None):
        lib = _load_vdec()
        if lib is None:
            raise RuntimeError("libvideodec unavailable")
        x1, y1, x2, y2 = roi_px if roi_px is not None else (0, 0, 0, 0)
        self._lib = lib
        self._h = lib.vdec_open(path.encode(), size, size,
                                int(x1), int(y1), int(x2), int(y2))
        if not self._h:
            raise RuntimeError(f"vdec_open failed for {path}")
        self.size = size

    def read(self, out: np.ndarray) -> bool:
        """Decode the next frame into ``out`` (u8 [size*3//2, size],
        C-contiguous). Returns False at EOF."""
        r = self._lib.vdec_read_i420(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if r < 0:
            raise RuntimeError(f"vdec_read_i420 error {r}")
        return bool(r)

    def seek(self, frame_idx: int) -> bool:
        """Position so the next read returns ``frame_idx``. Returns False
        when the container refuses (caller skips instead)."""
        return self._lib.vdec_seek(self._h, int(frame_idx)) == 0

    def skip(self, n: int) -> int:
        """Decode-and-discard ``n`` frames without crop/scale work (the
        cheap analog of cv2's grab()); returns frames actually skipped."""
        return int(self._lib.vdec_skip(self._h, int(n)))

    def close(self):
        if self._h:
            self._lib.vdec_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
