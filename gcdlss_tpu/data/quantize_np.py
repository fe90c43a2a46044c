"""Host-side (numpy) voxel quantization, mirroring the device path exactly.

Same key packing + sorted-unique semantics as `gcdlss_tpu.ops.coords`, so the
host data pipeline and the in-step device re-voxelization agree bit-for-bit.
Equivalent of `ME.utils.sparse_quantize(return_index=True, return_inverse=True)`.
Optionally accelerated by the native C++ voxelizer (csrc/voxelizer.cpp).
"""

from __future__ import annotations

import numpy as np

_native = None


def _get_native():
    global _native
    if _native is None:
        try:
            from . import native_voxelizer

            _native = native_voxelizer if native_voxelizer.available() else False
        except Exception:
            _native = False
    return _native


def sparse_quantize_np(points: np.ndarray, voxel_size: float):
    """Quantize [N,3] float points; returns (coords [M,3] int32 sorted,
    unique_map [M] first-occurrence indices, inverse_map [N])."""
    nat = _get_native()
    if nat:
        return nat.sparse_quantize(np.ascontiguousarray(points, np.float32), voxel_size)
    q = np.floor(points / voxel_size).astype(np.int64)
    off = 1 << 20
    key = ((q[:, 0] + off) << 42) | ((q[:, 1] + off) << 21) | (q[:, 2] + off)
    uniq, unique_map, inverse_map = np.unique(key, return_index=True, return_inverse=True)
    coords = q[unique_map].astype(np.int32)
    return coords, unique_map.astype(np.int64), inverse_map.astype(np.int64)
