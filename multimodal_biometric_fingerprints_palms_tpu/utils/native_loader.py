"""ctypes bindings for the native C++ batch image loader.

``native/batch_loader.cpp`` decodes grayscale JPEG/BMP on a C++ thread pool
and packs padded, normalized (B, H, W) float32 batches — the native-runtime
replacement for the reference's per-image cv2.imread under Python threads
(run_preprocessing.py:38-47,154). Builds lazily with g++ on first use;
callers fall back to the cv2 path when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmbfp_loader.so"
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists() or (_LIB_PATH.stat().st_mtime
                                      < (_NATIVE_DIR / "batch_loader.cpp").stat().st_mtime):
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.mbfp_batch_load.restype = ctypes.c_int
        lib.mbfp_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.mbfp_batch_load_u8.restype = ctypes.c_int
        lib.mbfp_batch_load_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def batch_load(paths, out_h: int, out_w: int, num_threads: int = 0):
    """Load images into a padded (N, H, W) float32 [0,1] batch.

    Returns (batch, status, widths, heights); status[i] == 0 on success.
    Raises RuntimeError if the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    batch = np.zeros((n, out_h, out_w), dtype=np.float32)
    status = np.ones((n,), dtype=np.int32)
    widths = np.zeros((n,), dtype=np.int32)
    heights = np.zeros((n,), dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.mbfp_batch_load(
        c_paths, n,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return batch, status, widths, heights


def batch_load_u8(paths, out_h: int, out_w: int, num_threads: int = 0):
    """Load images into a padded (N, H, W) uint8 batch — the runner's
    staging format (device casts to f32/255 on-chip). JPEG rows decode
    directly into the strided batch buffer: no intermediate pixel buffer,
    no float roundtrip on the host.

    Returns (batch, status, widths, heights); status[i] == 0 on success.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    batch = np.zeros((n, out_h, out_w), dtype=np.uint8)
    status = np.ones((n,), dtype=np.int32)
    widths = np.zeros((n,), dtype=np.int32)
    heights = np.zeros((n,), dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.mbfp_batch_load_u8(
        c_paths, n,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return batch, status, widths, heights
