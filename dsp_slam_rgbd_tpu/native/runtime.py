"""ctypes bindings for the native runtime (builds on first use).

See `src/runtime.cc` — velodyne reading, voxel downsampling, box cropping,
and a double-buffered background file prefetcher.  The library compiles
once with g++ -O3 and is cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "runtime.cc")
_LIB = os.path.join(_HERE, "src", "libdsruntime.so")
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
         _SRC, "-o", _LIB],
        check=True, capture_output=True,
    )


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.read_velodyne.restype = ctypes.c_long
        lib.read_velodyne.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_long]
        lib.voxel_downsample.restype = ctypes.c_long
        lib.voxel_downsample.argtypes = [ctypes.POINTER(ctypes.c_float),
                                         ctypes.c_long, ctypes.c_float,
                                         ctypes.POINTER(ctypes.c_float),
                                         ctypes.c_long]
        lib.box_crop.restype = ctypes.c_long
        lib.box_crop.argtypes = [ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_long] + \
            [ctypes.POINTER(ctypes.c_float)] * 3 + \
            [ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long
        ]
        lib.prefetcher_get.restype = ctypes.c_long
        lib.prefetcher_get.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                       ctypes.POINTER(ctypes.c_ubyte),
                                       ctypes.c_long]
        lib.prefetcher_size.restype = ctypes.c_long
        lib.prefetcher_size.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.prefetcher_destroy.restype = None
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_velodyne(path: str, max_pts: int = 200000) -> np.ndarray:
    lib = get_lib()
    out = np.empty((max_pts, 3), np.float32)
    n = lib.read_velodyne(path.encode(), _fp(out), max_pts)
    if n < 0:
        raise IOError(f"cannot read {path}")
    return out[:n].copy()


def voxel_downsample(pts: np.ndarray, voxel: float,
                     max_out: int = 100000) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty((max_out, 3), np.float32)
    n = lib.voxel_downsample(_fp(pts), len(pts), voxel, _fp(out), max_out)
    return out[:n].copy()


def box_crop(pts: np.ndarray, R: np.ndarray, t: np.ndarray,
             half_extent: np.ndarray, max_out: int = 100000) -> np.ndarray:
    lib = get_lib()
    pts = np.ascontiguousarray(pts, np.float32)
    R = np.ascontiguousarray(R, np.float32)
    t = np.ascontiguousarray(t, np.float32)
    h = np.ascontiguousarray(half_extent, np.float32)
    out = np.empty((max_out, 3), np.float32)
    n = lib.box_crop(_fp(pts), len(pts), _fp(R), _fp(t), _fp(h), _fp(out),
                     max_out)
    return out[:n].copy()


class Prefetcher:
    """Background double-buffered file reader."""

    def __init__(self, paths: list[str]):
        lib = get_lib()
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = lib.prefetcher_create(arr, len(paths))
        self._lib = lib
        self.paths = paths

    def get(self, idx: int) -> bytes:
        size = self._lib.prefetcher_size(self._h, idx)
        if size < 0:
            raise IOError(f"cannot read {self.paths[idx]}")
        out = np.empty(size, np.uint8)
        got = self._lib.prefetcher_get(
            self._h, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            size,
        )
        return out[:got].tobytes()

    def close(self):
        if self._h:
            self._lib.prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
