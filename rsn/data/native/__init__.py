"""ctypes bindings for the native (C++) dataloader.

Builds `loader.cpp` with g++ on first use (cached beside the source)
and exposes `decode_png_batch`.  Falls back cleanly (returns None) if a
toolchain or zlib is unavailable, in which case the Python/PIL path in
rsn.data.blender is used.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "_librsn_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) > os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.rsn_decode_png_batch.restype = ctypes.c_int
        lib.rsn_decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.rsn_probe_png.restype = ctypes.c_int
        lib.rsn_probe_png.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def probe_png(path: str):
    """-> (height, width) or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.rsn_probe_png(path.encode(), ctypes.byref(h),
                         ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_png_batch(paths: List[str], height: int, width: int,
                     blend_white: bool = True,
                     num_threads: int = 0) -> Optional[np.ndarray]:
    """Decode PNGs in parallel -> (N, H, W, 3) float32 in [0, 1].

    Returns None if the native library is unavailable or any image
    fails (caller falls back to PIL).
    """
    lib = get_lib()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), height, width, 3), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.rsn_decode_png_batch(
        arr, len(paths), height, width, int(blend_white),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if rc != 0:
        return None
    return out
