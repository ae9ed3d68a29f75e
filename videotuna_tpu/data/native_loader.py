"""ctypes bindings for the native frame-processing library.

The TPU-side equivalent of the reference's native data path (decord C++
decode + torchvision transforms, SURVEY.md §2.6): ``native/frameproc.cpp``
does batched center-crop→bilinear-resize→normalize on a std::thread pool.
Auto-builds with ``make -C native`` on first use; every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
LIB_PATH = NATIVE_DIR / "libframeproc.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
        lib.frameproc_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.frameproc_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.frameproc_version.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def crop_resize_normalize(frames: np.ndarray, size: Tuple[int, int],
                          threads: int = 0) -> np.ndarray:
    """(N, H, W, C) uint8 → (N, h, w, C) float32 in [-1, 1]; native path
    with numpy/cv2 fallback."""
    assert frames.dtype == np.uint8 and frames.ndim == 4
    n, sh, sw, c = frames.shape
    dh, dw = size
    lib = _load()
    if lib is not None:
        frames = np.ascontiguousarray(frames)
        out = np.empty((n, dh, dw, c), np.float32)
        nthreads = threads or min(os.cpu_count() or 4, 16)
        lib.frameproc_batch(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, sh, sw, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dh, dw, nthreads)
        return out
    # fallback: cv2 / numpy
    from videotuna_tpu.data.transforms import CenterCropResize, Normalize
    return Normalize()(CenterCropResize((dh, dw))(frames))


def normalize(frames: np.ndarray, threads: int = 0) -> np.ndarray:
    assert frames.dtype == np.uint8
    lib = _load()
    if lib is None:
        return frames.astype(np.float32) / 127.5 - 1.0
    flat = np.ascontiguousarray(frames)
    out = np.empty(frames.shape, np.float32)
    nthreads = threads or min(os.cpu_count() or 4, 16)
    lib.frameproc_normalize(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flat.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads)
    return out
