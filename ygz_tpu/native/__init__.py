"""Native (C++) runtime components, built on first use with the system
toolchain and loaded through ctypes (no pybind11 dependency).

Currently: the prefetching dataset loader (loader.cpp) — multi-threaded
image decode feeding the tracking loop, replacing the reference's
synchronous cv::imread on the latency-critical path."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_ygz_native.so")
_LIB = None


def _build() -> bool:
    src = os.path.join(_HERE, "loader.cpp")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", _SO, "-lpng", "-ljpeg", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(
                os.path.join(_HERE, "loader.cpp")):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ygz_loader_create.restype = ctypes.c_void_p
    lib.ygz_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.ygz_loader_next.restype = ctypes.c_int
    lib.ygz_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ygz_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.ygz_decode.restype = ctypes.c_int
    lib.ygz_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _LIB = lib
    return lib


class NativePrefetcher:
    """Iterator over decoded grayscale float32 frames, prefetched by a C++
    worker pool. Falls back to raising if the native lib can't build."""

    def __init__(self, paths: List[str], n_workers: int = 2,
                 queue_cap: int = 8, max_pixels: int = 4096 * 3072):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._paths = arr  # keep alive
        self._h = lib.ygz_loader_create(arr, len(paths), n_workers,
                                        queue_cap)
        self._buf = np.empty((max_pixels,), np.float32)
        self._n = len(paths)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._h is None:
            raise StopIteration
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.ygz_loader_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._buf.size, ctypes.byref(w), ctypes.byref(h))
        if rc == -1:
            self.close()
            raise StopIteration
        if rc < 0:
            raise IOError(f"native decode failed (rc={rc})")
        return self._buf[: w.value * h.value].reshape(
            h.value, w.value).copy()

    def close(self):
        if self._h is not None:
            self._lib.ygz_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_image(path: str, max_pixels: int = 4096 * 3072) -> np.ndarray:
    """One-shot native decode -> grayscale float32 [H, W]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    buf = np.empty((max_pixels,), np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.ygz_decode(path.encode(),
                        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        buf.size, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"native decode failed: {path} (rc={rc})")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()
