import numpy as np
import pytest

from gcdlss_tpu.data import native_voxelizer as nv


@pytest.mark.skipif(not nv.available(), reason="no C++ toolchain")
def test_native_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (20000, 3)).astype(np.float32)
    coords_n, uniq_n, inv_n = nv.sparse_quantize(pts, 0.2)

    # numpy reference (same packing/ordering semantics)
    q = np.floor(pts / 0.2).astype(np.int64)
    off = 1 << 20
    key = ((q[:, 0] + off) << 42) | ((q[:, 1] + off) << 21) | (q[:, 2] + off)
    _, uniq_r, inv_r = np.unique(key, return_index=True, return_inverse=True)
    np.testing.assert_array_equal(uniq_n, uniq_r)
    np.testing.assert_array_equal(inv_n, inv_r)
    np.testing.assert_array_equal(coords_n, q[uniq_r].astype(np.int32))


@pytest.mark.skipif(not nv.available(), reason="no C++ toolchain")
def test_native_decode_labels():
    raw = np.array([10 | (3 << 16), 48, 99, 259 | (7 << 16)], np.int32)
    lut = np.full(260, -1, np.int32)
    lut[10] = 0
    lut[48] = 10
    lut[259] = 4
    sem, inst = nv.decode_labels(raw, lut)
    np.testing.assert_array_equal(sem, [0, 10, -1, 4])
    np.testing.assert_array_equal(inst, [3, 0, 0, 7])
