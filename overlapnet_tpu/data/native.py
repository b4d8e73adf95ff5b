"""ctypes bindings for the native data-path library (native/batcher.cc).

Provides multi-threaded batch gathering with fused circular-shift
augmentation and parallel KITTI scan reading. Falls back to numpy when the
shared library has not been built (``make -C native``); ``build()`` compiles
it on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libovbatcher.so"))

_lib = None
_lib_lock = threading.Lock()


def build(force: bool = False) -> str:
    """Compile the native library (idempotent); returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        # On-demand build runs on the machine that will use the library, so
        # native-arch tuning is safe here (the Makefile default is portable).
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            env={**os.environ, "NATIVE_ARCH": "1"},
        )
    return _LIB_PATH


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ov_gather_batch.restype = ctypes.c_int
        lib.ov_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.ov_read_scans.restype = ctypes.c_int
        lib.ov_read_scans.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def gather_batch(
    src: np.ndarray,
    idx: np.ndarray,
    shifts: np.ndarray | None = None,
    out: np.ndarray | None = None,
    n_threads: int = 8,
) -> np.ndarray:
    """dst[b] = np.roll(src[idx[b]], shifts[b], axis=1) — native when built,
    numpy otherwise.

    Args:
      src: (N, H, W, C) float32 C-contiguous (pack memmap or array).
      idx: (B,) integer rows.
      shifts: (B,) int column shifts or None.
    """
    idx = np.ascontiguousarray(idx, np.int64)
    b = len(idx)
    n, h, w, c = src.shape
    if out is None:
        out = np.empty((b, h, w, c), np.float32)
    lib = _load()
    if lib is None or src.dtype != np.float32 or not src.flags.c_contiguous:
        for k in range(b):
            img = src[idx[k]]
            out[k] = np.roll(img, int(shifts[k]), axis=1) if shifts is not None else img
        return out
    sh_ptr = None
    if shifts is not None:
        shifts = np.ascontiguousarray(shifts, np.int32)
        sh_ptr = shifts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.ov_gather_batch(
        _fptr(src), n, h, w, c,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sh_ptr, b, _fptr(out), n_threads,
    )
    if rc != 0:
        raise IndexError("ov_gather_batch: index out of range")
    return out


def read_scans(
    paths: list[str], max_points: int, n_threads: int = 8
) -> np.ndarray:
    """Parallel KITTI .bin reader -> (n, max_points, 4) float32 zero-padded
    (pad_points semantics). Numpy fallback when the library is absent."""
    n = len(paths)
    out = np.zeros((n, max_points, 4), np.float32)
    lib = _load()
    if lib is None:
        from overlapnet_tpu.geometry.kitti import load_scan
        from overlapnet_tpu.geometry.projection import pad_points

        for i, p in enumerate(paths):
            out[i] = pad_points(load_scan(p), max_points)
        return out
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.ov_read_scans(arr, n, _fptr(out), max_points, n_threads)
    if failures:
        raise IOError(f"ov_read_scans: {failures} files failed to read")
    return out
