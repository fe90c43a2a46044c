"""ctypes binding for the native C++ voxelizer (csrc/voxelizer.cpp).

Auto-builds the shared library on first use if a toolchain is present;
`quantize_np.sparse_quantize_np` falls back to numpy when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libgcdlss_voxelizer.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.gcdlss_sparse_quantize.restype = ctypes.c_int64
        lib.gcdlss_sparse_quantize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gcdlss_decode_labels.restype = ctypes.c_int64
        lib.gcdlss_decode_labels.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def sparse_quantize(points: np.ndarray, voxel_size: float):
    lib = _load()
    n = points.shape[0]
    pts = np.ascontiguousarray(points, np.float32)
    coords = np.empty((n, 3), np.int32)
    unique = np.empty(n, np.int64)
    inverse = np.empty(n, np.int64)
    m = lib.gcdlss_sparse_quantize(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.c_float(voxel_size),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        unique.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return coords[:m].copy(), unique[:m].copy(), inverse


def decode_labels(raw: np.ndarray, lut: np.ndarray):
    lib = _load()
    n = raw.shape[0]
    raw = np.ascontiguousarray(raw, np.int32)
    lut = np.ascontiguousarray(lut, np.int32)
    sem = np.empty(n, np.int32)
    inst = np.empty(n, np.int32)
    lib.gcdlss_decode_labels(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), lut.shape[0],
        sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        inst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return sem, inst
