# -*- coding: utf-8 -*-
"""ctypes binding for the native slice cache (native/slicecache.cpp).

Keeps every decoded PNG slice in one contiguous C++ buffer and serves batch
gathers without Python in the loop.  Builds on demand (g++ + zlib, both baked
into the image); falls back cleanly when unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libslicecache.so")
_lib = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.slicecache_create.restype = ctypes.c_void_p
    lib.slicecache_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                      ctypes.c_int64]
    lib.slicecache_error.restype = ctypes.c_char_p
    lib.slicecache_error.argtypes = [ctypes.c_void_p]
    for fn in ("slicecache_count", "slicecache_height", "slicecache_width"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.slicecache_gather_u8.restype = None
    lib.slicecache_gather_u8.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.slicecache_gather_f32.restype = None
    lib.slicecache_gather_f32.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.slicecache_destroy.restype = None
    lib.slicecache_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class SliceCache:
    """Contiguous uint8 cache over a list of grayscale PNG paths."""

    def __init__(self, paths: List[str]):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native slicecache unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = lib.slicecache_create(arr, len(paths))
        err = lib.slicecache_error(self._h)
        if err:
            msg = err.decode()
            lib.slicecache_destroy(self._h)
            self._h = None
            raise RuntimeError(f"slicecache: {msg}")
        self.count = lib.slicecache_count(self._h)
        self.height = lib.slicecache_height(self._h)
        self.width = lib.slicecache_width(self._h)

    def gather_u8(self, idx: Sequence[int]) -> np.ndarray:
        out = np.empty((len(idx), self.height, self.width), np.uint8)
        ci = (ctypes.c_int64 * len(idx))(*idx)
        self._lib.slicecache_gather_u8(
            self._h, ci, len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out

    def gather_f32(self, idx: Sequence[int]) -> np.ndarray:
        """Fused gather + ToTensor + Normalize(0.5, 0.5) -> [-1, 1]."""
        out = np.empty((len(idx), self.height, self.width), np.float32)
        ci = (ctypes.c_int64 * len(idx))(*idx)
        self._lib.slicecache_gather_f32(
            self._h, ci, len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            self._lib.slicecache_destroy(self._h)
